package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Z-order layout: pure physical rewrite (content untouched) whose
  * per-file footer ranges are tight on EVERY z column — the property
  * parquet min/max pruning feeds on. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // 100×100 grid: two independent dimensions with identical ranges
  private def grid = (0 until 10000).map(i => (i.toLong, (i % 100).toLong,
    (i / 100).toLong)).toDF("id", "x", "y")

  test("zOrder preserves content exactly and lands the file count") {
    val root = java.nio.file.Files.createTempDirectory("graft_z").toString
    Layout.writeZOrdered(grid, s"$root/z", Seq("x", "y"), files = 8)
    val back = spark.read.parquet(s"$root/z")
    assert(rowsOf(back) == rowsOf(grid))
    assert(Layout.fileRanges(spark, s"$root/z", "x").size == 8)
  }

  test("z-ordered files cover tight ranges on BOTH columns vs naive") {
    val root = java.nio.file.Files.createTempDirectory("graft_z").toString
    Layout.writeZOrdered(grid, s"$root/z", Seq("x", "y"), files = 8)
    grid.repartition(8).write.parquet(s"$root/naive")
    def sumWidth(dir: String, c: String): Double =
      Layout.fileRanges(spark, dir, c).map { case (_, lo, hi) => hi - lo }.sum
    // naive round-robin files each span ~the full [0,99] range of both
    // columns (Σ widths ≈ 8·99); the z-layout's hyper-rectangles must
    // be far tighter on BOTH dimensions at once
    for (c <- Seq("x", "y")) {
      val (z, naive) = (sumWidth(s"$root/z", c), sumWidth(s"$root/naive", c))
      assert(z < 0.7 * naive,
        s"z layout not tighter on $c: z=$z naive=$naive")
    }
  }

  test("rejects string z-columns and over-wide bit budgets loudly") {
    val d = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Layout.zOrder(d, Seq("s"), files = 1)
    }
    intercept[IllegalArgumentException] {
      Layout.zOrder(d, Seq("id"), files = 1, bits = 63)
    }
    // constant column: degenerate range must not divide by zero
    val const = Seq((1L, 5L), (2L, 5L)).toDF("id", "c")
    assert(Layout.zOrder(const, Seq("c"), files = 1).count() == 2)
  }

  test("timestamps and dates are valid z dimensions") {
    val d = Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-06-01 00:00:00")))
      .toDF("id", "t")
    assert(rowsOf(Layout.zOrder(d, Seq("t"), files = 1)) == rowsOf(d))
  }
}
