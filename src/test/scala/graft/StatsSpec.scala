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

  test("runningZScore scores against PRIOR rows only; stream twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    // key 1: 1,2,3,1,2,10 — the 10 is an outlier vs its 5 priors;
    // key 2: too few rows, all NULL z
    val rows = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0),
      (1L, 4L, 1.0), (1L, 5L, 2.0), (1L, 6L, 10.0),
      (2L, 7L, 5.0), (2L, 8L, 6.0))
    val df = rows.toDF("k", "o", "v")
    val out = Stats.runningZScore(df, col("k"), col("o"), col("v"),
      minPrior = 5).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1L) == ((0L, None)))           // no priors
    assert(out(5L) == ((4L, None)))           // below minPrior
    assert(out(6L)._1 == 5L && out(6L)._2.get > 3.0) // the outlier fires
    assert(out(8L) == ((1L, None)))
    // streaming twin over a two-batch in-order replay: identical output
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val q = graft.streaming.Streaming.anomalyStream(
        in.toDF().toDF("k", "o", "v"), col("k"), col("o"), col("v"),
        minPrior = 5)
      .writeStream.format("memory").queryName("zspec_out")
      .outputMode("append").start()
    try {
      in.addData(rows.filter(_._2 <= 4)); q.processAllAvailable()
      in.addData(rows.filter(_._2 > 4)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("zspec_out").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(streamed == out)
    intercept[IllegalArgumentException] {
      Stats.runningZScore(df, col("k"), col("o"), col("v"), minPrior = 1)
    }
  }

  test("ema folds in order per key, skips NULLs, handles big groups") {
    val d = Seq((1L, 3L, 10.0), (1L, 1L, 1.0), (1L, 2L, 2.0),
      (2L, 1L, 5.0)).toDF("k", "o", "v")
    val out = Stats.ema(d, Seq("k"), "o", "v", alpha = 0.2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // key 1 ordered 1,2,10: e=1; 0.2*2+0.8*1=1.2; 0.2*10+0.8*1.2=2.96
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - 2.96) < 1e-12)
    assert(out(2L) == ((1L, 5.0)))
    // NULL values are skipped, not folded as zero
    val withNull = Seq((1L, 1L, java.lang.Double.valueOf(4.0)),
      (1L, 2L, null.asInstanceOf[java.lang.Double])).toDF("k", "o", "v")
    val nOut = Stats.ema(withNull, Seq("k"), "o", "v", 0.5).collect()(0)
    assert(nOut.getLong(1) == 1L && nOut.getDouble(2) == 4.0)
    // a group larger than any buffer still folds linearly
    val big = (1L to 50000L).map(i => (9L, i, 1.0)).toDF("k", "o", "v")
    val bOut = Stats.ema(big, Seq("k"), "o", "v", 0.3).collect()(0)
    assert(bOut.getLong(1) == 50000L && math.abs(bOut.getDouble(2) - 1.0) < 1e-12)
    intercept[IllegalArgumentException] { Stats.ema(d, Seq("k"), "o", "v", 0.0) }
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
