package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution diagnostics over huge columns — the profiling step a
  * training-data pipeline runs before deciding filters/mixes (length
  * histograms, quality-score distributions, per-source token counts).
  * Everything here is a single map-side-combinable aggregation: at
  * 100 TB a histogram is one scan producing `bins` rows, never a sort,
  * never a collect of data rows.
  */
object Stats {

  /** Equi-width histogram of `c` over [lo, hi): `bins` rows
    * (bin, bin_lo, bin_hi, n). Out-of-range values clamp into the edge
    * bins (so Σn = row count — a histogram that silently drops tails
    * misreports the distribution); NULLs are excluded. Bin assignment
    * is double arithmetic on both engines' identical operands, so the
    * oracle replays it bit-exactly. Empty bins are emitted with n = 0
    * (a distribution's gaps are information), via a broadcast
    * bin-spine outer join — `bins` rows, driver-free. */
  def histogram(df: DataFrame, c: Column, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1, s"histogram: bins must be >= 1, got $bins")
    require(lo < hi, s"histogram: need lo < hi, got [$lo, $hi)")
    val spark = df.sparkSession
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((c.cast("double") - lit(lo)) / lit(width)).cast("long"),
      lit(0L)), lit(bins - 1L))
    val counts = df.filter(c.isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
    import spark.implicits._
    val spine = (0L until bins.toLong).toDF("bin")
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("bin_hi"))
    broadcast(spine).join(counts, Seq("bin"), "left")
      .select(col("bin"), col("bin_lo"), col("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Running z-score per key: each row scored against the mean/stddev
    * of its PRIOR rows only (ordered by `order` — pass a unique,
    * monotone column; event_id in the events table), the leakage-free
    * online-anomaly shape: a spike is judged by what was known BEFORE
    * it. NULL until `minPrior` prior rows exist or while prior variance
    * is 0. One window pass — running Σ and Σ² are taken in decimal
    * (order-free, exact) and the moment formula runs in double on
    * bit-identical operands, so the score is deterministic across
    * engines and partitionings (same recipe as
    * [[graft.agg.reducers.rvarSamp]]). Output: input columns +
    * (n_prior, z).
    *
    * Scale: one shuffle on `key`, per-key frames evaluated by one
    * running-window pass — no self-join, no per-row re-aggregation. The
    * streaming twin ([[graft.streaming.Streaming.anomalyStream]]) keeps
    * (n, Σ, Σ²) as keyed state and must score identically. */
  def runningZScore(df: DataFrame, key: Column, order: Column,
      value: Column, minPrior: Int = 5): DataFrame = {
    require(minPrior >= 2, s"runningZScore: minPrior must be >= 2, got $minPrior")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val v = value.cast("double")
    val n = count(v).over(w)
    val sx = sum(v.cast("decimal(28,8)")).over(w).cast("double")
    val sxx = sum((v * v).cast("decimal(28,8)")).over(w).cast("double")
    val nd = n.cast("double")
    val varP = (nd * sxx - sx * sx) / (nd * (nd - 1))
    df.withColumn("n_prior", n)
      .withColumn("z",
        when(n < minPrior || !(varP > 0), lit(null).cast("double"))
          .otherwise((v - sx / nd) / sqrt(varP)))
  }

  /** Exponential moving average per key — the inherently SEQUENTIAL
    * time-series reduction (EMA₁ = x₁; EMAₜ = α·xₜ + (1−α)·EMAₜ₋₁),
    * which no commutative aggregate expresses. Distributed shape:
    * secondary sort — one repartition on `keys`, an in-partition sort
    * on (keys, order), then a single linear scan per partition folding
    * each group — no per-group materialization, so group size is
    * unbounded (the same pattern as the batch acceptor-deduplicate).
    * The fold is plain left-to-right double arithmetic, bit-identical
    * to DuckDB's `list_reduce` over the same order, which is what the
    * oracle replays. Returns one row per key: (keys…, n, ema).
    * NULL values are skipped (they would poison the recursion). */
  def ema(df: DataFrame, keys: Seq[String], orderCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"ema: alpha must be in (0,1], got $alpha")
    require(keys.nonEmpty, "ema: need at least one key column")
    val prepared = df
      .filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ col(orderCol).as("_o") :+
        col(valueCol).cast("double").as("_v"): _*)
      .repartition(keys.map(col): _*)
      .sortWithinPartitions(keys.map(col) :+ col("_o"): _*)
    val schema = prepared.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex("_v")
    val outSchema = org.apache.spark.sql.types.StructType(
      keys.map(schema(_)) :+
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false) :+
        org.apache.spark.sql.types.StructField("ema",
          org.apache.spark.sql.types.DoubleType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    prepared.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.Row] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): org.apache.spark.sql.Row = {
          val k = keyIdx.map(buf.head.get)
          var n = 0L
          var acc = 0.0
          while (buf.hasNext && keyIdx.map(buf.head.get) == k) {
            val v = buf.next().getDouble(vIdx)
            acc = if (n == 0) v else alpha * v + (1 - alpha) * acc
            n += 1
          }
          org.apache.spark.sql.Row.fromSeq(k :+ n :+ acc)
        }
      }
    }(enc)
  }

  // -------------------------------------------------------------------
  // Deterministic HyperLogLog (Flajolet et al. 2007): distinct counting
  // in one map-side-combinable scan with m = 2^b registers of fixed
  // size per key — at 100 TB the exact `count(distinct x)` shuffles
  // every distinct value; the sketch shuffles ≤ tasks·keys·m tiny
  // partial-max rows, and per-period register tables MERGE (max per
  // bucket) into per-month/per-corpus estimates without rescanning.
  // Unlike Spark's approx_count_distinct (HLL++, engine-private), every
  // step here is md5 + integer arithmetic an oracle replays exactly.

  /** md5 leading-zero geometry shared by the sketch, the estimate, AND
    * [[graft.streaming.Streaming.hllStream]]'s state fold: rho is
    * capped so Σ 2^(cap−rho) stays an exact BIGINT. Package-visible so
    * the streaming twin can't drift on a re-tuned cap. */
  private[graft] val HllRhoCap = 30

  /** Sparse HLL registers of `c` per `keys`: (keys…, bucket, rho) with
    * only NON-EMPTY buckets present (absent bucket ≡ rho 0) — the shape
    * you persist per day/source and [[hllMerge]] later.
    *
    * hash = md5(salt ‖ value): bucket = first 16 hash bits mod m,
    * rho = (leading zero bits of the remaining 112) + 1, capped at 30
    * (a cap hit has probability 2⁻³⁰ per value — nanoscale bias — and
    * buys exact-integer Z accounting in [[hllEstimate]]). Every step is
    * hex-string arithmetic both engines reproduce bit-identically;
    * duplicates land on identical (bucket, rho), so the register
    * table is a pure function of the distinct SET. */
  def hllRegisters(df: DataFrame, keys: Seq[String], c: Column, b: Int,
      salt: String = "hll"): DataFrame = {
    require(b >= 4 && b <= 12, s"hllRegisters: b must be in [4,12], got $b")
    val m = 1 << b
    val h = md5(concat(lit(salt), c.cast("string")))
    val bucket = (conv(substring(h, 1, 4), 16, 10).cast("int") % m).as("bucket")
    val rest = substring(h, 5, 28)
    val z = length(regexp_extract(rest, "^0*", 0))
    val d = when(z === 28, lit(0))
      .otherwise(conv(rest.substr(z + 1, lit(1)), 16, 10).cast("int"))
    val extra = when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(lit(3))
    val rho = least(
      when(z === 28, lit(HllRhoCap))
        .otherwise(lit(4) * z + extra + 1),
      lit(HllRhoCap)).cast("int")
    df.filter(c.isNotNull)
      .groupBy((keys.map(col) :+ bucket): _*)
      .agg(max(rho).as("rho"))
  }

  /** Scala twin of the [[hllRegisters]] column recipe — ONE hash
    * geometry shared with [[graft.streaming.Streaming.hllStream]]'s
    * keyed state (StatsSpec pins column ≡ scalar bit-for-bit, so the
    * stream and the batch sketch can never drift apart). */
  def hllBucketRho(value: String, b: Int, salt: String = "hll"): (Int, Int) = {
    val md = Stats.md5Digest.get()
    md.reset()
    val hx = md.digest((salt + value).getBytes(
      java.nio.charset.StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
    val bucket = Integer.parseInt(hx.substring(0, 4), 16) % (1 << b)
    val rest = hx.substring(4, 32)
    val z = rest.takeWhile(_ == '0').length
    val rho = if (z == 28) HllRhoCap else {
      val d = Integer.parseInt(rest.substring(z, z + 1), 16)
      val extra = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
      math.min(4 * z + extra + 1, HllRhoCap)
    }
    (bucket, rho)
  }

  /** Scala twin of the [[hllEstimate]] arithmetic from (present-bucket
    * count, present-bucket Σ2^(30−rho)) — the same IEEE operation
    * sequence as the column expressions, so a streaming state estimate
    * equals the batch estimate EXACTLY (StatsSpec pins it). */
  def hllEstimateScalar(np: Long, zup: Long, b: Int): Double = {
    val m = 1 << b
    val alpha = if (m == 16) 0.673 else if (m == 32) 0.697
      else if (m == 64) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    val v0 = m - np
    val zu = (zup + v0 * (1L << HllRhoCap)).toDouble
    val raw = alpha * m.toDouble * m.toDouble * math.pow(2.0, HllRhoCap) / zu
    if (raw <= 2.5 * m && v0 > 0) m.toDouble * math.log(m.toDouble / v0.toDouble)
    else raw
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Merge two register tables (same keys, same b): max rho per bucket —
    * associative/commutative/idempotent, so per-partition, per-day, or
    * per-source sketches combine in any order into exactly the sketch
    * of the union (the spec and oracle pin merged ≡ direct). */
  def hllMerge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.union(b).groupBy((keys :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("rho"))

  /** Estimate per key from sparse registers: (keys…, estimate).
    *
    * Z⁻¹ = Σ_buckets 2^(−rho) is accounted in exact 2⁻³⁰ units —
    * present buckets contribute 2^(30−rho), each absent bucket 2³⁰ —
    * so the sum is an exact BIGINT (≤ m·2³⁰ = 2⁴², exact in double
    * too) and the raw estimate α·m²·2³⁰/Z_units is power-of-two-exact
    * arithmetic up to its single final division: bit-identical on any
    * engine, any partitioning. Small-range branch (E ≤ 2.5m with empty
    * buckets) switches to linear counting m·ln(m/V) — the branch
    * predicate is exact, so both engines take the same branch. Standard
    * error ≈ 1.04/√m (~3.3% at b = 10). */
  def hllEstimate(registers: DataFrame, keys: Seq[String], b: Int): DataFrame = {
    require(b >= 4 && b <= 12, s"hllEstimate: b must be in [4,12], got $b")
    val m = 1 << b
    val alpha = if (m == 16) 0.673 else if (m == 32) 0.697
      else if (m == 64) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    val agg = registers
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_np"),
        sum(pow(lit(2.0), lit(HllRhoCap) - col("rho")).cast("long")).as("_zup"))
    val v0 = lit(m) - col("_np")
    val zu = (col("_zup") + v0 * lit(1L << HllRhoCap)).cast("double")
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
      lit(math.pow(2.0, HllRhoCap)) / zu
    agg.select(keys.map(col) :+
      when(raw <= lit(2.5 * m) && v0 > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / v0.cast("double")))
        .otherwise(raw).as("estimate"): _*)
  }

  // -------------------------------------------------------------------
  // Deterministic count-min sketch (Cormode & Muthukrishnan 2005): the
  // frequency twin of the HLL sketch above — item-frequency upper
  // bounds in d·w fixed cells per key, one map-side-combinable scan,
  // and per-day/per-source sketches MERGE by cell addition. At 100 TB
  // an exact per-item count shuffles every item once; the sketch
  // shuffles ≤ tasks·keys·d·w partial-count rows, and a later frequency
  // probe is a d-row join, never a rescan. Estimates only OVERCOUNT
  // (est ≥ true frequency, within ≈ rows/w with probability 1−2^−d) —
  // the right shape for heavy-hitter cutoffs and frequency-capped
  // sampling. Every hash is md5 arithmetic an oracle replays exactly.

  /** Sparse CM cells of `item` per `keys`: (keys…, r, b, cnt) for the
    * d hash rows, only touched buckets present (absent ≡ 0). Bucket of
    * row r = first 32 md5 bits of (salt ‖ r ‖ '|' ‖ item) mod w. NULL
    * items are excluded. */
  def cmSketch(df: DataFrame, keys: Seq[String], item: Column,
      w: Int, d: Int, salt: String = "cm"): DataFrame = {
    require(w >= 2, s"cmSketch: w must be >= 2, got $w")
    require(d >= 1, s"cmSketch: d must be >= 1, got $d")
    df.filter(item.isNotNull)
      .select(keys.map(col) :+ item.cast("string").as("_it"): _*)
      .withColumn("r", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("b", cmBucket(col("r"), col("_it"), w, salt))
      .groupBy(keys.map(col) :+ col("r") :+ col("b"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  private[operators] def cmBucket(r: Column, it: Column, w: Int,
      salt: String): Column =
    conv(substring(md5(concat(lit(salt), r.cast("string"), lit("|"), it)),
      1, 8), 16, 10).cast("long") % w

  /** Merge two cell tables (same keys, w, d, salt): counts ADD per
    * cell — the sketch of a union is exactly the cell-wise sum, so
    * per-partition/per-day sketches combine in any order. */
  def cmMerge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.union(b).groupBy((keys :+ "r" :+ "b").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Frequency upper bound per probe item: min over the d rows of that
    * item's cell counts (missing cell = 0). `items` carries the same
    * key columns plus the probe item; d rows join per probe — the
    * corpus is never rescanned. Returns (keys…, item, est). */
  def cmLookup(sketch: DataFrame, items: DataFrame, keys: Seq[String],
      item: Column, w: Int, d: Int, salt: String = "cm"): DataFrame = {
    require(w >= 2 && d >= 1, s"cmLookup: bad geometry (w=$w, d=$d)")
    val probes = items
      .select(keys.map(col) :+ item.cast("string").as("item"): _*)
      .withColumn("r", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("b", cmBucket(col("r"), col("item"), w, salt))
    probes.join(sketch, keys :+ "r" :+ "b", "left")
      .groupBy((keys :+ "item").map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Percentile (rank) normalization of a score column per key — the
    * step that makes heterogeneous quality scores mixable: each row
    * gets its percent rank pct = (rank − 1)/(n − 1) within its key
    * (0 for a single-row key), ordered by (value, `id`) so exact score
    * ties normalize deterministically. One window pass = one shuffle +
    * per-key sort; for a corpus where even one sort is too much, bin
    * with [[histogram]] and map scores through the cumulative bin
    * fractions instead (a broadcast lookup, no sort) — this exact path
    * is for the usual per-source/per-domain normalization where keys
    * bound the sort. Output: input columns + `pct`. NULL values get
    * NULL pct and don't consume ranks — the window runs on the non-null
    * subset and joins back by `id` (unique by contract): engines
    * disagree on where NULLs sort (Spark NULLS FIRST asc, DuckDB NULLS
    * LAST), so letting them into the window would shift every rank. */
  def rankNormalize(df: DataFrame, keys: Seq[String], value: Column,
      id: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_rn_v").asc, col("_rn_id").asc)
    val pcts = df.filter(value.isNotNull)
      .select(keys.map(col) :+ id.as("_rn_id") :+
        value.cast("double").as("_rn_v"): _*)
      .withColumn("pct", percent_rank().over(w))
      .select(col("_rn_id"), col("pct"))
    df.join(pcts, id === col("_rn_id"), "left").drop("_rn_id")
  }

  /** Two-sample drift check between two corpus versions per key (the
    * data-drift monitor a pipeline runs before swapping in a new crawl):
    * per key, both sides' count/mean/sample-variance from decimal-exact
    * Σ/Σ² (the [[runningZScore]] determinism recipe — order-free, so
    * any partitioning produces identical doubles) and the two-sample
    * z statistic (m_new − m_old)/√(v_old/n_old + v_new/n_new). NULL z
    * while either side has < `minN` rows or both variances are 0.
    * Two map-side-combinable aggregates + one join of key-sized tables.
    * Output: (keys…, n_old, n_new, mean_old, mean_new, z). */
  def drift(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      value: Column, minN: Int = 5): DataFrame = {
    require(minN >= 2, s"drift: minN must be >= 2, got $minN")
    def side(df: DataFrame, sfx: String): DataFrame = {
      val v = value.cast("double")
      df.filter(v.isNotNull)
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as(s"n_$sfx"),
          sum(v.cast("decimal(28,8)")).cast("double").as(s"_sx$sfx"),
          sum((v * v).cast("decimal(28,8)")).cast("double").as(s"_sxx$sfx"))
    }
    def meanOf(sfx: String) = col(s"_sx$sfx") / col(s"n_$sfx").cast("double")
    def varOf(sfx: String) = {
      val nd = col(s"n_$sfx").cast("double")
      (nd * col(s"_sxx$sfx") - col(s"_sx$sfx") * col(s"_sx$sfx")) /
        (nd * (nd - 1))
    }
    val se = sqrt(varOf("old") / col("n_old").cast("double") +
      varOf("new") / col("n_new").cast("double"))
    side(oldDf, "old").join(side(newDf, "new"), keys)
      .select(keys.map(col) :+ col("n_old") :+ col("n_new") :+
        meanOf("old").as("mean_old") :+ meanOf("new").as("mean_new") :+
        when(col("n_old") < minN || col("n_new") < minN || !(se > 0),
          lit(null).cast("double"))
          .otherwise((meanOf("new") - meanOf("old")) / se).as("z"): _*)
  }

  /** [[histogram]] with bounds taken from the column itself — one extra
    * tiny min/max aggregate, then the same single-scan histogram. */
  def histogramAuto(df: DataFrame, c: Column, bins: Int): DataFrame = {
    val r = df.agg(min(c.cast("double")).as("lo"), max(c.cast("double")).as("hi"))
      .collect()(0)
    require(!r.isNullAt(0), "histogramAuto: column is all-NULL")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    // degenerate constant column: one bin covering the point
    histogram(df, c, lo, if (hi > lo) hi else lo + 1.0, bins)
  }
}
