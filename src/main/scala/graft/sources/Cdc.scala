package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Debezium-style change-data-capture decode + state materialization
  * (reference: python/pathway/io/debezium/__init__.py:20 `read` — keeps a
  * table up to date from a Debezium topic; envelope parsing in the
  * engine's connector layer, src/connectors/data_format.rs Debezium
  * parser: ops c/r/u/d with before/after images keyed by primary key).
  *
  * Spark-first split: TRANSPORT is whatever DataFrame/stream carries the
  * envelope strings (kafka via `spark.readStream.format("kafka")` where
  * the jar ships, files, MemoryStream in tests — graft.sources.io), and
  * these functions handle the FORMAT + SEMANTICS:
  *
  *  - [[decodeDebezium]]: typed `from_json` decode of the standard
  *    envelope `{payload: {before, after, op, ts_ms}}` (or the flattened
  *    form produced by Debezium's ExtractNewRecordState transform) into
  *    (_op, _ts_ms, _before, _after) with soft-error NULLs on malformed
  *    input — same convention as `functions.json_typed`;
  *  - [[applyLatest]]: batch materialization of current state — the
  *    highest-`order` event per key wins, a winning delete tombstones
  *    the row. ONE aggregate via struct-max (map-side combinable, no
  *    window sort, no join-back) — at 100 TB this is a single shuffle
  *    by key, the minimum any per-key semantics can do;
  *  - [[upsertStream]]: the streaming twin — flatMapGroupsWithState in
  *    update mode emits the new value (or a tombstone) whenever a
  *    higher-`order` event arrives; out-of-order events below the
  *    current watermark-held state are ignored, matching the
  *    at-least-once replay rule of the reference's connector.
  */
object Cdc {

  /** Debezium JSON envelope schema for a row payload type. */
  def envelopeSchema(row: StructType): StructType =
    StructType(Seq(StructField("payload", payloadSchema(row))))

  private def payloadSchema(row: StructType): StructType =
    StructType(Seq(
      StructField("before", row), StructField("after", row),
      StructField("op", StringType), StructField("ts_ms", LongType)))

  /** Decode a column of Debezium envelope JSON strings.
    *
    * Returns the input frame's other columns plus `_op`, `_ts_ms`,
    * `_before`, `_after` (structs typed by `row`). Malformed JSON or
    * absent fields decode to NULL (soft errors — route them with
    * `Table.splitErrors` if the pipeline wants a dead-letter side).
    *
    * `flat = true` decodes Debezium's ExtractNewRecordState output,
    * which puts the ROW'S OWN FIELDS at the top level (the envelope is
    * unwrapped away): the whole message is the after image; op/ts_ms
    * survive only as the SMT's `add.fields` metadata (`__op`,
    * `__ts_ms`), defaulted to an upsert when absent; a
    * `delete.handling.mode=rewrite` delete carries `__deleted="true"`.
    * `_before` is always NULL in this mode — ENRS discards it. */
  def decodeDebezium(df: DataFrame, value: Column, row: StructType,
      flat: Boolean = false): DataFrame =
    if (flat) {
      val meta = StructType(row.fields ++ Seq(
        StructField("__op", StringType), StructField("__ts_ms", LongType),
        StructField("__deleted", StringType)))
      val d = df.withColumn("_p", from_json(value, meta))
      d.withColumn("_op",
          when(col("_p").isNull, lit(null).cast(StringType))
            .when(col("_p.__deleted") === "true", lit("d"))
            .otherwise(coalesce(col("_p.__op"), lit("u"))))
        .withColumn("_ts_ms", col("_p.__ts_ms"))
        .withColumn("_before",
          lit(null).cast(row)) // ENRS drops the before image
        .withColumn("_after",
          when(col("_p").isNull, lit(null).cast(row))
            .otherwise(struct(row.fieldNames.toSeq
              .map(n => col(s"_p.$n").as(n)): _*)))
        .drop("_p")
    } else {
      val payload = from_json(value, envelopeSchema(row)).getField("payload")
      df.withColumn("_p", payload)
        .withColumn("_op", col("_p.op"))
        .withColumn("_ts_ms", col("_p.ts_ms"))
        .withColumn("_before", col("_p.before"))
        .withColumn("_after", col("_p.after"))
        .drop("_p")
    }

  /** Materialize current state from a batch of decoded change events:
    * per key, the event with the highest `order` wins; if that event is
    * a delete (`op = "d"`), the key is absent from the result. Keys are
    * read from the after image, falling back to before (deletes carry
    * only before). `order` must totally order events within a key —
    * ts_ms alone if unique, else `struct(ts_ms, offset)` (Debezium only
    * orders events by the (ts_ms, offset) pair when two changes land in
    * the same millisecond; struct orders compare component-wise here).
    *
    * Single struct-max aggregate (via ColUtils.argmaxRowsOrdered, the
    * non-negating path — struct orders can't be negated): one shuffle
    * by key, partial aggregation map-side — the scalable shape for a
    * 100 TB replay. Returns the after-image columns. */
  def applyLatest(decoded: DataFrame, keys: Seq[String], order: Column)
      : DataFrame = {
    val keyCols = keys.map(k =>
      coalesce(col(s"_after.$k"), col(s"_before.$k")).as(s"_k_$k"))
    val keyed = decoded.select((keyCols :+ struct(col("_op"), col("_after"))
      .as("_ev") :+ order.as("_ord")): _*)
    val latest = graft.operators.ColUtils.argmaxRowsOrdered(
      keyed, keys.map(k => col(s"_k_$k")), col("_ord"))
    latest.filter(col("_ev._op") =!= "d" && col("_ev._after").isNotNull)
      .select(col("_ev._after.*"))
  }

  /** Streaming upsert state: events (key, order, isDelete, value) →
    * update-mode stream of (key, Option[value]) — None is a tombstone.
    * State per key is the highest `order` seen + its value; lower-order
    * (late, replayed) events emit nothing.
    *
    * State lifetime: one entry PER KEY EVER SEEN, kept for the run's
    * lifetime by default — the same per-key arrangement memory the
    * reference's upsert session holds, bounded by key cardinality (NOT
    * by a watermark: watermarks do not evict flatMapGroupsWithState
    * state). For unbounded/churning key spaces pass `idleTtl` > 0 to
    * evict keys idle that long (processing time); an evicted key loses
    * its replay guard, so a later out-of-order event older than the
    * evicted state would resurrect — pick a TTL larger than the
    * source's max replay lag, and keep durable arbitration in
    * [[applyLatest]] / the upsert parquet sink. */
  def upsertStream[K: Encoder, V](events: Dataset[(K, Long, Boolean, V)],
      idleTtl: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration.Zero)(
      implicit ev: Encoder[(K, Option[V])],
      sv: Encoder[(Long, Boolean, V)],
      tv: Encoder[(K, Long, Boolean, V)]): Dataset[(K, Option[V])] = {
    val ttlMs = if (idleTtl.isFinite) idleTtl.toMillis else 0L
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Boolean, V), (K, Option[V])](
        OutputMode.Update(), timeoutConf) {
        (key, rows, state: GroupState[(Long, Boolean, V)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val best = rows.maxBy(_._2)
            val cur = state.getOption
            val out =
              if (cur.exists(_._1 >= best._2)) Iterator.empty
              else {
                state.update((best._2, best._3, best._4))
                Iterator.single((key,
                  if (best._3) Option.empty[V] else Some(best._4)))
              }
            if (ttlMs > 0 && state.exists) state.setTimeoutDuration(ttlMs)
            out
          }
      }
  }
}
