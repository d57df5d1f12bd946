package graft

import org.apache.spark.sql.functions._
import graft.core.Table

/** Salted-join rewrite (Table.joinSalted): row-identical to the plain
  * join; the hot key spreads over `buckets` sub-keys. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Table.fromDF(
    ((1 to 900).map(i => (1L, i)) ++ // hot key
      (1 to 100).map(i => (2L + i % 5, i))).toDF("k", "v"), Seq("k"))
  private lazy val dim = Table.fromDF(
    Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unused")).toDF("k", "name"),
    Seq("k"))

  test("inner salted join equals plain inner join") {
    val salted = fact.joinSalted(dim, Seq("k"), buckets = 8)
    assert(rowsOf(salted.df) == rowsOf(fact.df.join(dim.df, Seq("k"))))
  }

  test("left salted join keeps unmatched left rows exactly once") {
    val salted = fact.joinSalted(dim, Seq("k"), buckets = 3, how = "left")
    val plain = fact.df.join(dim.df, Seq("k"), "left")
    assert(salted.df.count() == plain.count())
    assert(rowsOf(salted.df) == rowsOf(plain))
  }

  test("right/outer modes are rejected") {
    intercept[IllegalArgumentException] {
      fact.joinSalted(dim, Seq("k"), 4, how = "full")
    }
  }

  test("bigramLogProbs salted count-joins are row-identical to the plain path") {
    import graft.operators.TextOps
    // head-word-skewed corpus: "the" starts most bigrams
    val docs = ((1L to 40L).map(i => (i, s"the cat ${i % 3} the dog the end")) ++
      Seq((98L, "one two"), (99L, "solo")))
      .toDF("id", "text")
    val plain = rowsOf(TextOps.bigramLogProbs(docs, col("id"), col("text"))
      .select(col("id"), round(col("lp") + lit(1e-9), 6).as("lp")))
    val salted = rowsOf(TextOps.bigramLogProbs(docs, col("id"), col("text"),
        saltBuckets = 8)
      .select(col("id"), round(col("lp") + lit(1e-9), 6).as("lp")))
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
