package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Distribution diagnostics: histogram binning semantics the oracle
  * exercises at corpus scale. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram clamps tails, emits empty bins, excludes NULLs") {
    val d = Seq[java.lang.Double](-5.0, 0.0, 10.0, 25.0, 49.0, 120.0, null)
      .toDF("x")
    val h = Stats.histogram(d, col("x"), lo = 0.0, hi = 50.0, bins = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // -5 clamps into bin 0, 120 into bin 4; NULL excluded; bin 3 empty
    assert(h == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 2L))
    // Σn = non-null rows (clamping keeps the tails)
    assert(h.values.sum == 6L)
    val bounds = Stats.histogram(d, col("x"), 0.0, 50.0, 5)
      .orderBy("bin").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(bounds.head == ((0.0, 10.0)) && bounds.last == ((40.0, 50.0)))
  }

  test("histogramAuto derives bounds; constant column degenerates to one bin") {
    val d = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val h = Stats.histogramAuto(d, col("x"), bins = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h.values.sum == 4L)
    val const = Seq(7.0, 7.0).toDF("x")
    val hc = Stats.histogramAuto(const, col("x"), bins = 4).collect()
    assert(hc.map(_.getLong(3)).sum == 2L)
    intercept[IllegalArgumentException] {
      Stats.histogram(d, col("x"), 5.0, 5.0, 3)
    }
    intercept[IllegalArgumentException] {
      Stats.histogramAuto(Seq[java.lang.Double](null).toDF("x"), col("x"), 3)
    }
  }
}
