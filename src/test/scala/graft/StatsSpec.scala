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

  test("hll: estimate tracks exact distinct, dup-invariant, NULL excluded") {
    val n = 5000
    // 3 copies of every value + nulls: the sketch is a pure function of
    // the distinct SET
    val vals = (0 until n).flatMap(i => Seq.fill(3)(i.toLong))
    val df = (vals.map(v => ("a", Option(v))) :+ (("a", None: Option[Long])))
      .toDF("g", "v")
    val regs = Stats.hllRegisters(df, Seq("g"), col("v"), b = 10)
    val distinctRegs = Stats.hllRegisters(
      (0 until n).map(i => ("a", i.toLong)).toDF("g", "v"),
      Seq("g"), col("v"), b = 10)
    assert(rowsOf(regs) == rowsOf(distinctRegs))
    // sparse: at most m = 1024 register rows, rho in [1, 30]
    val rr = regs.collect()
    assert(rr.length <= 1024)
    assert(rr.forall { r => val x = r.getInt(2); x >= 1 && x <= 30 })
    // 5000 distinct at b = 10 (σ ≈ 3.3%): within 15% is a safe pin
    val est = Stats.hllEstimate(regs, Seq("g"), b = 10)
      .collect()(0).getDouble(1)
    assert(math.abs(est / n - 1.0) < 0.15, s"estimate $est vs exact $n")
  }

  test("hll: column registers ≡ the shared scalar geometry bit-for-bit") {
    // hllBucketRho is the SAME function hllStream's keyed state uses —
    // this pin is what keeps the stream and the batch sketch from
    // drifting (bucket mod, zero-run length, nibble class, cap)
    val vals = (0L until 400L)
    val expected = vals.map(v => Stats.hllBucketRho(v.toString, b = 6))
      .groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2).max) }
    val got = Stats.hllRegisters(vals.map(("a", _)).toDF("g", "v"),
        Seq("g"), col("v"), b = 6)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(got == expected)
  }

  test("hll: stream replay's final estimate equals the batch estimate exactly") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 600).map(i => ((i % 3).toLong, (i * 7 % 211).toLong))
    val batch = Stats.hllEstimate(
        Stats.hllRegisters(rows.toDF("k", "v"), Seq("k"), col("v"), b = 6),
        Seq("k"), b = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val out = graft.streaming.Streaming.hllStream(
      in.toDF().toDF("k", "v"), col("k"), col("v"), b = 6)
    val q = out.writeStream.format("memory").queryName("hll_stream_spec")
      .outputMode("append").start()
    try {
      in.addData(rows.take(300)); q.processAllAvailable()
      in.addData(rows.drop(300)); q.processAllAvailable()
    } finally q.stop()
    // last emission per key (n_seen = 200 rows each) — BIT-equal doubles
    val fin = spark.table("hll_stream_spec").filter(col("n_seen") === 200)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(fin == batch)
  }

  test("hll: merged disjoint-half sketches equal the direct sketch") {
    val df = (0 until 3000).map(i => (if (i % 3 == 0) "x" else "y", i.toLong))
      .toDF("g", "v")
    val a = Stats.hllRegisters(df.filter(col("v") % 2 === 0), Seq("g"), col("v"), b = 8)
    val b = Stats.hllRegisters(df.filter(col("v") % 2 === 1), Seq("g"), col("v"), b = 8)
    val merged = Stats.hllMerge(a, b, Seq("g"))
    val direct = Stats.hllRegisters(df, Seq("g"), col("v"), b = 8)
    assert(rowsOf(merged) == rowsOf(direct))
    // merge is idempotent: re-merging the direct sketch changes nothing
    assert(rowsOf(Stats.hllMerge(direct, direct, Seq("g"))) == rowsOf(direct))
    // small group in the linear-counting branch still sane: "x" has 1000
    val ests = Stats.hllEstimate(direct, Seq("g"), b = 8).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ests("x") / 1000.0 - 1.0) < 0.2, s"x: ${ests("x")}")
    assert(math.abs(ests("y") / 2000.0 - 1.0) < 0.2, s"y: ${ests("y")}")
  }

  test("ema: stream replay's final fold equals the batch fold exactly") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 300).map(i =>
      ((i % 2).toLong, i.toLong, math.sin(i) * 10))
    val batch = Stats.ema(rows.toDF("k", "o", "v"), Seq("k"), "o", "v",
        alpha = 0.3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val out = graft.streaming.Streaming.emaStream(
      in.toDF().toDF("k", "o", "v"), col("k"), col("o"), col("v"), 0.3)
    val q = out.writeStream.format("memory").queryName("ema_stream_spec")
      .outputMode("append").start()
    try {
      in.addData(rows.take(100)); q.processAllAvailable()
      in.addData(rows.slice(100, 300)); q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table("ema_stream_spec").filter(col("n") === 150)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(fin == batch) // BIT-equal doubles across the batch boundary
  }

  test("cm sketch: estimates only overcount, exact when collision-free, " +
      "merge ≡ direct, NULL excluded") {
    // skewed multiplicities: item i appears i+1 times; plus nulls
    val rows = (0 until 40).flatMap(i => Seq.fill(i + 1)(Option(i.toLong))) :+
      (None: Option[Long])
    val df = rows.map(("a", _)).toDF("g", "v")
    val exact = (0 until 40).map(i => i.toString -> (i + 1L)).toMap
    // wide sketch: 40 items into w=4096 → almost surely collision-free,
    // estimates are EXACT counts
    val wide = Stats.cmSketch(df, Seq("g"), col("v"), w = 4096, d = 3)
    val estWide = Stats.cmLookup(wide,
        (0 until 40).map(i => ("a", i.toLong)).toDF("g", "v"),
        Seq("g"), col("v"), w = 4096, d = 3)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(estWide == exact)
    // tight sketch: collisions possible, but NEVER an undercount
    val tight = Stats.cmSketch(df, Seq("g"), col("v"), w = 8, d = 2)
    val estTight = Stats.cmLookup(tight,
        (0 until 40).map(i => ("a", i.toLong)).toDF("g", "v"),
        Seq("g"), col("v"), w = 8, d = 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(estTight.forall { case (k, e) => e >= exact(k) })
    // merged disjoint halves ≡ direct sketch (cell-wise addition)
    val a = Stats.cmSketch(df.filter(col("v") % 2 === 0), Seq("g"), col("v"), 64, 2)
    val b = Stats.cmSketch(df.filter(col("v") % 2 === 1), Seq("g"), col("v"), 64, 2)
    val direct = Stats.cmSketch(df, Seq("g"), col("v"), 64, 2)
    assert(rowsOf(Stats.cmMerge(a, b, Seq("g"))) == rowsOf(direct))
    // sketch size is bounded by geometry, nulls contribute nothing
    assert(direct.count() <= 2 * 64)
    assert(direct.agg(sum("cnt")).collect()(0).getLong(0) ==
      2L * rows.count(_.isDefined))
  }

  test("rankNormalize: per-key percent rank, deterministic ties, NULL inert") {
    val df = Seq(
      ("a", 1L, Option(10.0)), ("a", 2L, Option(20.0)), ("a", 3L, Option(20.0)),
      ("a", 4L, Option(30.0)), ("a", 5L, None),
      ("b", 6L, Option(7.0))).toDF("g", "id", "v")
    val out = Stats.rankNormalize(df, Seq("g"), col("v"), col("id"))
      .collect().map(r => r.getLong(1) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // key a non-null ranks over 4 rows: 10 → 0, two 20s id-tie-broken
    // to 1/3 and 2/3, 30 → 1; NULL row gets NULL without shifting ranks
    assert(out(1L).contains(0.0))
    assert(out(2L).contains(1.0 / 3) && out(3L).contains(2.0 / 3))
    assert(out(4L).contains(1.0))
    assert(out(5L).isEmpty)
    // single-row key: percent_rank 0 on both engines
    assert(out(6L).contains(0.0))
  }

  test("drift: exact moments, two-sample z fires on a shifted mean") {
    val oldDf = (0 until 40).map(i => (1L, 10.0 + (i % 5))).toDF("k", "v")
    val newDf = (0 until 40).map(i => (1L, 30.0 + (i % 5))).toDF("k", "v")
    val r = Stats.drift(oldDf, newDf, Seq("k"), col("v")).collect()(0)
    assert(r.getLong(1) == 40 && r.getLong(2) == 40)
    assert(r.getDouble(3) == 12.0 && r.getDouble(4) == 32.0)
    assert(r.getDouble(5) > 10.0) // unmistakable shift
    // identical sides: z ≈ 0, never NULL while variance > 0
    val same = Stats.drift(oldDf, oldDf, Seq("k"), col("v")).collect()(0)
    assert(math.abs(same.getDouble(5)) < 1e-12)
    // below minN: z NULL
    val tiny = Stats.drift(oldDf.limit(3), newDf, Seq("k"), col("v"))
      .collect()(0)
    assert(tiny.isNullAt(5))
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
