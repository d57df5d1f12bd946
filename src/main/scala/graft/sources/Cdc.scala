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
    * `flat = true` expects payload fields at the top level (Debezium's
    * ExtractNewRecordState single-message transform). */
  def decodeDebezium(df: DataFrame, value: Column, row: StructType,
      flat: Boolean = false): DataFrame = {
    val payload =
      if (flat) from_json(value, payloadSchema(row))
      else from_json(value, envelopeSchema(row)).getField("payload")
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
    * (late, replayed) events emit nothing. Pair with a watermark on the
    * event-time column upstream to bound state when keys churn. */
  def upsertStream[K: Encoder, V](events: Dataset[(K, Long, Boolean, V)])(
      implicit ev: Encoder[(K, Option[V])],
      sv: Encoder[(Long, Boolean, V)],
      tv: Encoder[(K, Long, Boolean, V)]): Dataset[(K, Option[V])] =
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Boolean, V), (K, Option[V])](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[(Long, Boolean, V)]) =>
          val best = rows.maxBy(_._2)
          val cur = state.getOption
          if (cur.exists(_._1 >= best._2)) Iterator.empty
          else {
            state.update((best._2, best._3, best._4))
            Iterator.single((key, if (best._3) None else Some(best._4)))
          }
      }
}
