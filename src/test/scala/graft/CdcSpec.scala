package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Cdc

/** Debezium CDC decode + state materialization (reference:
  * python/pathway/io/debezium/__init__.py:20 — ops c/r/u/d with
  * before/after images replayed into a maintained table). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val row = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("decodeDebezium: envelope + flat forms, malformed → soft NULLs") {
    val env = Seq(
      """{"payload":{"after":{"id":1,"v":"a"},"op":"c","ts_ms":10}}""",
      """{"payload":{"before":{"id":1,"v":"a"},"op":"d","ts_ms":20}}""",
      "not json at all").toDF("value")
    val d = Cdc.decodeDebezium(env, col("value"), row)
    val got = d.select(col("_op"), col("_ts_ms"), col("_after.v"), col("_before.id"))
    assert(rowsOf(got) == Set(
      Seq("c", 10L, "a", null), Seq("d", 20L, null, 1L), Seq(null, null, null, null)))

    // flat = ExtractNewRecordState output: the row's own fields at top
    // level; __op/__ts_ms only via add.fields; rewrite-mode deletes carry
    // __deleted; bare messages default to an upsert
    val flat = Seq(
      """{"id":7,"v":"x","__op":"u","__ts_ms":5}""",
      """{"id":8,"v":"y"}""",
      """{"id":9,"v":null,"__deleted":"true","__ts_ms":6}""").toDF("value")
    val f = Cdc.decodeDebezium(flat, col("value"), row, flat = true)
    assert(rowsOf(f.select(col("_op"), col("_after.id"), col("_ts_ms"))) == Set(
      Seq("u", 7L, 5L), Seq("u", 8L, null), Seq("d", 9L, 6L)))
  }

  test("applyLatest: latest op wins per key, delete tombstones, before-keyed deletes") {
    val env = Seq(
      // key 1: create then update → updated value survives
      """{"payload":{"after":{"id":1,"v":"a"},"op":"c","ts_ms":10}}""",
      """{"payload":{"after":{"id":1,"v":"a2"},"op":"u","ts_ms":30}}""",
      // key 2: create then delete (delete carries only before) → absent
      """{"payload":{"after":{"id":2,"v":"b"},"op":"c","ts_ms":10}}""",
      """{"payload":{"before":{"id":2,"v":"b"},"op":"d","ts_ms":40}}""",
      // key 3: delete then REINSERT at higher ts → present again
      """{"payload":{"before":{"id":3,"v":"c"},"op":"d","ts_ms":10}}""",
      """{"payload":{"after":{"id":3,"v":"c2"},"op":"c","ts_ms":20}}""").toDF("value")
    val state = Cdc.applyLatest(
      Cdc.decodeDebezium(env, col("value"), row), Seq("id"), col("_ts_ms"))
    assert(rowsOf(state) == Set(Seq(1L, "a2"), Seq(3L, "c2")))
  }

  test("applyLatest: duplicate ts_ms — struct(ts_ms, offset) order decides") {
    // the scaladoc-recommended recipe for non-unique ts_ms: Debezium only
    // orders same-millisecond events by their log offset
    val env = Seq(
      // key 1: two updates in the SAME millisecond — offset must decide
      ("""{"payload":{"after":{"id":1,"v":"first"},"op":"u","ts_ms":10}}""", 1L),
      ("""{"payload":{"after":{"id":1,"v":"second"},"op":"u","ts_ms":10}}""", 2L),
      // key 2: create then delete in the same millisecond → tombstoned
      ("""{"payload":{"after":{"id":2,"v":"alive"},"op":"c","ts_ms":10}}""", 3L),
      ("""{"payload":{"before":{"id":2,"v":"alive"},"op":"d","ts_ms":10}}""", 4L))
      .toDF("value", "offset")
    val state = Cdc.applyLatest(
      Cdc.decodeDebezium(env, col("value"), row), Seq("id"),
      struct(col("_ts_ms"), col("offset")))
    assert(rowsOf(state) == Set(Seq(1L, "second")))
  }

  test("upsertStream: update-mode emissions, late events suppressed, tombstones") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Boolean, String)]
    val out = Cdc.upsertStream(in.toDS())
    val q = out.toDF("id", "v").writeStream.format("memory")
      .queryName("cdc_upserts").outputMode("update").start()
    try {
      in.addData((1L, 10L, false, "a"), (2L, 10L, false, "b"))
      q.processAllAvailable()
      in.addData((1L, 5L, false, "STALE")) // below state order → no emission
      q.processAllAvailable()
      in.addData((1L, 20L, true, "a"))     // tombstone
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, v FROM cdc_upserts").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).toList
      assert(rows.contains((1L, Some("a"))) && rows.contains((2L, Some("b"))))
      assert(!rows.exists(_._2.contains("STALE")))
      assert(rows.contains((1L, None)))
    } finally q.stop()
  }
}
