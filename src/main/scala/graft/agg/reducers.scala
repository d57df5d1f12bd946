package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation surface — the reference's reducer set
  * (reference: python/pathway/internals/reducers.py, engine enum
  * src/engine/reduce.rs:22-38). The engine implements reducers as
  * Semigroup partial+final combines (reduce.rs:40 SemigroupReducerImpl),
  * which is exactly Spark's partial aggregation model — every mapping
  * below keeps map-side combine.
  */
object reducers {

  // Straight built-ins (reducers.py:267 min, :292 max, :317 sum, :552
  // count, :586 avg) — codegen'd, partial-agg capable.
  def rmin(c: Column): Column = min(c)
  def rmax(c: Column): Column = max(c)
  def rsum(c: Column): Column = sum(c)
  def rcount(): Column = count(lit(1))
  def ravg(c: Column): Column = avg(c)

  /** Exact interpolated percentile (continuous quantile): sorted group,
    * index p·(n−1), linear interpolation between neighbors — the same
    * definition as DuckDB's `quantile_cont` and NumPy's default, so the
    * oracle replays it directly. Exact (sort-based) rather than sketched:
    * the group's values are collected per-key, so use on groups that fit
    * an executor (dimension-grained percentiles). For corpus-wide
    * percentiles over 100 TB prefer `approx_percentile`, which is
    * mergeable/partial-agg capable but NOT cross-engine deterministic. */
  def rpercentile(c: Column, p: Double): Column = {
    require(p >= 0 && p <= 1, s"percentile p must be in [0,1], got $p")
    percentile(c, lit(p))
  }

  /** Exact median — [[rpercentile]] at 0.5. */
  def rmedian(c: Column): Column = rpercentile(c, 0.5)

  // -- second-moment statistics -----------------------------------------
  // Cross-engine-deterministic variants of stddev/var/covar/corr: the
  // built-ins aggregate doubles in partition order, so partial-agg order
  // flips the last ulp between runs AND between engines. These instead
  // take every SUM exactly (per-row cast to decimal, exact decimal
  // addition — order-free), cast the finished sums to double, and apply
  // the closed-form moment formula as a handful of double ops on
  // bit-identical operands — deterministic on any engine, any partition
  // count. Still one pass, still map-side combinable (the sums are plain
  // partial aggs; only the final projection differs).
  private def dsum8(c: Column): Column =
    sum(c.cast("decimal(28,8)")).cast("double")

  /** Exact-sum sample variance: (n·Σx² − (Σx)²) / (n·(n−1)).
    * NULL for groups of size < 2, like `var_samp`. */
  def rvarSamp(c: Column): Column = {
    val n = count(c).cast("double")
    val sx = dsum8(c)
    val sxx = dsum8(c * c)
    when(count(c) < 2, lit(null).cast("double"))
      .otherwise((n * sxx - sx * sx) / (n * (n - 1)))
  }

  /** Exact-sum sample standard deviation — sqrt of [[rvarSamp]];
    * greatest(0) guards the tiny-negative cancellation case. */
  def rstddevSamp(c: Column): Column =
    sqrt(greatest(rvarSamp(c), lit(0.0)))

  /** Exact-sum sample covariance: (n·Σxy − Σx·Σy) / (n·(n−1)). */
  def rcovarSamp(x: Column, y: Column): Column = {
    val n = count(lit(1)).cast("double")
    val (sx, sy, sxy) = (dsum8(x), dsum8(y), dsum8(x * y))
    when(count(lit(1)) < 2, lit(null).cast("double"))
      .otherwise((n * sxy - sx * sy) / (n * (n - 1)))
  }

  /** Exact-sum Pearson correlation:
    * (n·Σxy − Σx·Σy) / √(n·Σx² − (Σx)²) / √(n·Σy² − (Σy)²).
    * NULL when either side has zero variance (constant column or n < 2)
    * — the built-in raises DIVIDE_BY_ZERO under ANSI mode there. */
  def rcorr(x: Column, y: Column): Column = {
    val n = count(lit(1)).cast("double")
    val (sx, sy) = (dsum8(x), dsum8(y))
    val (sxx, syy, sxy) = (dsum8(x * x), dsum8(y * y), dsum8(x * y))
    val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
    when(dx <= 0 || dy <= 0, lit(null).cast("double"))
      .otherwise((n * sxy - sx * sy) / sqrt(dx) / sqrt(dy))
  }

  /** Deterministic mode as a single agg expression over PRE-COUNTED
    * (value, cnt) rows — most frequent value, smallest value on ties
    * (min_by over (−cnt, value) lexicographic order). Spark's built-in
    * `mode` and DuckDB's are both tie-UNDEFINED; pinning the tie makes
    * the result a pure function of the data. Use via the two-level
    * shape: groupBy(key, value).count, then groupBy(key)
    * .agg(modeOfCounted(value, cnt)) — both aggregations map-side
    * combine, and the first collapses the data to (key, distinct-value)
    * cardinality before anything wide happens. */
  def modeOfCounted(value: Column, cnt: Column): Column =
    min_by(value, struct((-cnt).as("nc"), value.as("v")))

  /** argmin/argmax return the row id of the extremal row
    * (reference: reducers.py:360/:393, Reducer::ArgMin/ArgMax). Spark's
    * min_by/max_by are the direct partial-agg analogs; pass the key (or
    * pointer) column as `id`. */
  def argmin(id: Column, by: Column): Column = min_by(id, by)
  def argmax(id: Column, by: Column): Column = max_by(id, by)

  /** `unique` — the single distinct value; ERROR if more than one
    * (reference: reducers.py:426, Reducer::Unique errors on >1 distinct).
    * Declarative: count(distinct)>1 raises at action time. */
  def runique(c: Column): Column =
    when(count_distinct(c) > 1,
      raise_error(concat(lit("unique: more than one distinct value in group"))))
      .otherwise(max(c))

  /** `any` — an arbitrary element (reference: reducers.py:457). We pick
    * min for determinism (the reference only guarantees *some* element;
    * deterministic choice is strictly stronger and test-friendly). */
  def rany(c: Column): Column = min(c)

  /** sorted_tuple (reference: reducers.py:485). `skipNones = false`
    * keeps NULL entries, sorted FIRST — the reference's Value derives
    * Ord with None as the first enum variant (value.rs:207), so None
    * compares smallest. collect_list drops nulls, so the keep path
    * routes values through a struct wrapper first. */
  def sorted_tuple(c: Column, skipNones: Boolean = true): Column =
    if (skipNones) array_sort(collect_list(c))
    else transform(
      // struct is non-null even when c is null, so nulls survive the
      // collect; (isNotNull, v) sorts nulls first (false < true), then
      // ascending — matching the reference's None-smallest Ord
      array_sort(collect_list(struct(c.isNotNull.as("n"), c.as("v")))),
      x => x.getField("v"))

  /** tuple in `sort_by` order (reference: reducers.py:516) — gather
    * (sortKey, value) structs, sort, project value. All codegen'd array
    * functions; no UDF. */
  def tuple_by(c: Column, sortBy: Column): Column =
    transform(array_sort(collect_list(struct(sortBy.as("k"), c.as("v")))), x => x("v"))

  /** ndarray reducer (reference: reducers.py:618) — dense array in sort
    * order. */
  def ndarray_by(c: Column, sortBy: Column): Column = tuple_by(c, sortBy)

  /** earliest / latest by an event-time column (reference: reducers.py:653
    * / :687; engine orders by processing time — batch analog is the event
    * time the caller supplies). */
  def earliest(c: Column, time: Column): Column = min_by(c, time)
  def latest(c: Column, time: Column): Column = max_by(c, time)

  /** Element-wise vector sum (reference: ArraySum, reduce.rs) as a typed
    * Aggregator — merge is O(dim), partial-agg friendly. */
  val arraySumFloat: Aggregator[Seq[Float], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Float], Array[Double], Seq[Double]] {
      def zero: Array[Double] = Array.emptyDoubleArray
      private def add(b: Array[Double], a: Seq[Float]): Array[Double] =
        if (a == null) b
        else if (b.isEmpty) a.map(_.toDouble).toArray
        else {
          // raggedness must fail LOUDLY and deterministically: silently
          // sizing from whichever row aggregates first would crash or
          // drop dimensions depending on partition order
          require(a.length == b.length,
            s"arraySumFloat: ragged arrays in group (${a.length} vs ${b.length})")
          var i = 0; while (i < b.length) { b(i) += a(i); i += 1 }; b
        }
      def reduce(b: Array[Double], a: Seq[Float]): Array[Double] = add(b, a)
      def merge(x: Array[Double], y: Array[Double]): Array[Double] =
        if (x.isEmpty) y else if (y.isEmpty) x
        else {
          require(x.length == y.length,
            s"arraySumFloat: ragged arrays in group (${x.length} vs ${y.length})")
          var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x
        }
      def finish(r: Array[Double]): Seq[Double] = r.toSeq
      def bufferEncoder: Encoder[Array[Double]] =
        Encoders.javaSerialization[Array[Double]]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Declarative element-wise array sum for fixed dim — stays in codegen:
    * aggregate(collect_list) would buffer; instead reduce pairwise with
    * zip_with via sum over posexploded values is preferable at scale.
    * Provided here as the simple composition for medium cardinality. */
  def array_sum_fixed(c: Column, dim: Int): Column =
    array((0 until dim).map(i => sum(element_at(c, i + 1))): _*)

  /** Custom stateful reducer SPI (reference: internals/custom_reducers.py
    * :174 BaseCustomAccumulator — from_row/update/compute_result; retract
    * is a streaming-only concern, batch recompute is semantically equal).
    */
  abstract class CustomReducer[IN, BUF, OUT] extends Aggregator[IN, BUF, OUT]

  // -------------------------------------------------------------------
  // Retraction-aware reduction (reference: custom_reducers.py:174
  // BaseCustomAccumulator.retract — the engine feeds row DELTAS, so its
  // accumulators must be able to subtract a retracted row).
  //
  // Spark-first mapping: a diff stream is a DataFrame whose rows carry
  // diff ∈ {+1, -1} (Debezium decode, Table.diff, and any CDC source
  // produce exactly this shape). Group-invertible reducers fold
  // retractions as NEGATIVE contributions inside one ordinary aggregate
  // — no custom state, map-side combinable, the same Semigroup shape the
  // engine's SemigroupReducerImpl has, and valid in streaming update
  // mode unchanged. Non-invertible reducers (min/max/unique/tuple)
  // cannot subtract; [[netRows]] first collapses the diff stream to its
  // net surviving row images, after which every batch reducer above
  // applies — the "batch recompute is semantically equal" half of the
  // reference's contract, made explicit.
  def retractSum(c: Column, diff: Column): Column = sum(c * diff)
  def retractCount(diff: Column): Column = sum(diff)
  def retractAvg(c: Column, diff: Column): Column = sum(c * diff) / sum(diff)

  /** Collapse a diff stream to its net surviving row images: group by
    * the full row image, keep images with sum(diff) > 0, and emit each
    * image with its NET MULTIPLICITY (sequence+explode) — so
    * multiplicity-sensitive reducers (sorted_tuple/tuple_by/count over
    * the collapsed frame) see the same multiset the reference's
    * delta-fed accumulator sees, not a deduplicated one. Feeds the
    * NON-invertible reducers; invertible ones should use retractSum/
    * Count/Avg directly and skip this extra shuffle.
    *
    * The diff column may be any numeric type (cast to long here —
    * sequence() requires an integral bound). A single row image whose
    * net multiplicity is huge materializes that many array slots before
    * the explode; `maxMultiplicity` bounds it loudly (raise, not OOM) —
    * raise the cap only if the pipeline genuinely carries such images. */
  def netRows(df: org.apache.spark.sql.DataFrame, diffCol: String,
              maxMultiplicity: Long = 10_000_000L)
      : org.apache.spark.sql.DataFrame = {
    val cols = df.columns.filterNot(_ == diffCol).toSeq
    df.groupBy(cols.map(col): _*)
      .agg(sum(col(diffCol).cast("long")).as("_net"))
      .filter(col("_net") > 0)
      .withColumn("_net",
        when(col("_net") > maxMultiplicity,
          raise_error(concat(lit(s"netRows: net multiplicity exceeds $maxMultiplicity for a single row image"))))
          .otherwise(col("_net")))
      .withColumn("_copy", explode(sequence(lit(1L), col("_net"))))
      .select(cols.map(col): _*)
  }
}
