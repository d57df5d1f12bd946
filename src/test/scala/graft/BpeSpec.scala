package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge learning / segmentation semantics (operators/Bpe.scala). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-computed rounds, lexicographic tie-break, " +
      "early stop when no pair repeats") {
    // freqs: ab:2, ac:1 → states "a b </w>"×2, "a c </w>"
    // round 1 pairs: (a,b):2, (b,</w>):2, (a,c):1, (c,</w>):1
    //   tie at 2 → lexicographic: "a b" < "b </w>" → merge (a,b)
    // round 2 pairs: (ab,</w>):2, rest cnt 1 → merge (ab,</w>)
    // round 3: every pair cnt 1 → filtered → early stop (2 rows, not 4)
    val docs = Seq((1L, "ab ab ac")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, col("text"), rounds = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(m.toSeq == Seq(
      (0, "a", "b", "ab", 2L),
      (1, "ab", "</w>", "ab</w>", 2L)))
  }

  test("merge application is greedy left-to-right non-overlapping") {
    // "aaa" merging (a,a) must give [aa, a], never [a, aa]
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // round 1: (a,a) cnt 4 beats (a,</w>) cnt 2
    val m = Bpe.learnMerges(docs, col("text"), rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(m == Seq(("a", "a")))
    val seg = Bpe.segment(docs.limit(1), col("doc_id"), col("text"), m)
      .select("pieces").collect().head.getSeq[String](0)
    assert(seg == Seq("aa", "a", "</w>"))
  }

  test("segment round-trips: pieces concatenate back to word + marker") {
    val docs = Seq((1L, "lower lowest low low lower")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, col("text"), rounds = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Bpe.segment(docs, col("doc_id"), col("text"), merges)
      .select("word", "pieces").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getSeq[String](1)
      assert(pieces.mkString("") == word + Bpe.EndOfWord,
        s"$word -> $pieces")
      assert(pieces.last.endsWith(Bpe.EndOfWord))
    }
  }

  test("determinism: re-learning yields the identical merge table") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs, col("text"), rounds = 5)
      .orderBy("rank").collect().toSeq
    val b = Bpe.learnMerges(docs, col("text"), rounds = 5)
      .orderBy("rank").collect().toSeq
    assert(a == b && a.size == 5)
  }

  test("segment plan is shuffle-free (literal replace chain, one scan)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Bpe.segment(docs, col("doc_id"), col("text"),
        Seq(("a", "b"), ("ab", "</w>")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
