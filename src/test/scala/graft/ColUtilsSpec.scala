package graft

import org.apache.spark.sql.functions._
import graft.operators.ColUtils

/** Column/row utilities (reference: stdlib/utils/col.py, filtering.py). */
class ColUtilsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0),
    ("b", 4L, 5.0)).toDF("k", "id", "v")

  test("argmaxRows keeps the full extreme row; ties break to smallest tieBreak") {
    val out = ColUtils.argmaxRows(df, Seq(col("k")), col("v"), col("id"))
    assert(rowsOf(out) == Set(Seq("a", 2L, 30.0), Seq("b", 4L, 5.0)))
    val mn = ColUtils.argminRows(df, Seq(col("k")), col("v"), col("id"))
    assert(rowsOf(mn) == Set(Seq("a", 1L, 10.0), Seq("b", 4L, 5.0)))
  }

  test("majority picks the modal value per group; ties to smallest value") {
    val votes = Seq((1L, "pizza"), (1L, "pizza"), (1L, "hotdog"),
      (2L, "pasta"), (2L, "pasta"), (2L, "hotdog"), (2L, "hotdog"))
      .toDF("grp", "vote")
    val out = ColUtils.majority(votes, col("grp"), col("vote"))
    // group 2 ties 2-2 -> smallest value "hotdog" wins
    assert(rowsOf(out) == Set(Seq(1L, "pizza"), Seq(2L, "hotdog")))
  }

  test("unpackCol projects struct fields to top-level columns (col.py:60)") {
    val t = df.select(struct(col("k"), col("id")).as("s"))
    val out = ColUtils.unpackCol(t, col("s"), "k", "id")
    assert(out.columns.toSeq == Seq("k", "id") && out.count() == 4)
  }
}
