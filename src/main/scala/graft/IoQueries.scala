package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkEntry.load
import graft.sources.{io, Cdc}

/** Driver-checked fs-connector round-trips (reference:
  * python/pathway/io/fs/__init__.py:33 — csv, jsonlines, plaintext).
  *
  * Each query WRITES a copy of a small parquet table in the connector's
  * format, then reads it back through `graft.sources.io` — exercising the
  * full read+write path, not just the format-string mapping. The oracle
  * reads the same files with DuckDB's read_csv/read_json, so the compare
  * proves Spark's writer/reader and DuckDB agree on the bytes.
  *
  * Paths are keyed by the SF-dir basename: the driver correctness-checks
  * at sf0.01 (the path hardcoded in the oracle SQL), while bench runs at
  * other SFs write elsewhere and can never clobber the checked files
  * between the Verify dump and the driver's DuckDB pass.
  */
object IoQueries extends QueryModule {

  /** Typed CDC envelope rows for q_cdc_subject_log — the nested-struct
    * values the subject-log codec carries since r11. */
  case class COrder(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double)
  case class CEvent(_op: String, _ts_ms: Long, _after: COrder, _before: COrder)

  private def ioDir(dir: String) =
    s"/tmp/graft_io/${new java.io.File(dir).getName}"

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", LongType), StructField("n_name", StringType),
    StructField("n_regionkey", LongType)))

  q("q_io_csv",
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM read_csv('/tmp/graft_io/sf0.01/nation_csv/*.csv', header=true)""") { (s, dir) =>
    val out = s"${ioDir(dir)}/nation_csv"
    io.write(load(s, dir, "nation").coalesce(1), out, "csv",
      options = Map("header" -> "true"))
    io.csv(s, out, schema = nationSchema, key = Seq("n_nationkey")).df
  }

  q("q_io_jsonlines",
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM read_json('/tmp/graft_io/sf0.01/nation_json/*.json')""") { (s, dir) =>
    val out = s"${ioDir(dir)}/nation_json"
    io.write(load(s, dir, "nation").coalesce(1), out, "json")
    io.jsonlines(s, out, schema = nationSchema, key = Seq("n_nationkey")).df
  }

  // hive-partitioned parquet layout round-trip: write partitioned by
  // n_regionkey, read back through the partition-discovering reader. The
  // partition column comes back via directory inference (int in Spark,
  // engine-dependent in DuckDB) — pinned to BIGINT on both sides.
  q("q_io_partitioned",
    """SELECT n_nationkey, n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
      |FROM read_parquet('/tmp/graft_io/sf0.01/nation_part/**/*.parquet',
      |  hive_partitioning=1)""") { (s, dir) =>
    val out = s"${ioDir(dir)}/nation_part"
    io.write(load(s, dir, "nation"), out, "parquet",
      partitionBy = Seq("n_regionkey"))
    io.parquet(s, out, key = Seq("n_nationkey")).df
      .select(col("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"))
  }

  // z-order layout rewrite (Delta OPTIMIZE ZORDER analog): lineitem
  // re-clustered along the (l_partkey, l_suppkey) Morton curve, then a
  // selective two-column scan over the REWRITTEN files — the oracle
  // reads those same files, proving the rewrite is pure layout (row
  // content untouched) while each output file covers a tight key-space
  // hyper-rectangle the parquet footers can prune on
  q("q_io_zorder",
    """SELECT l_suppkey, count(*) AS n,
      |  CAST(sum(l_orderkey) AS BIGINT) AS key_sum
      |FROM read_parquet('/tmp/graft_io/sf0.01/lineitem_zorder/*.parquet')
      |WHERE l_partkey < 200 AND l_suppkey < 40
      |GROUP BY 1""") { (s, dir) =>
    val out = s"${ioDir(dir)}/lineitem_zorder"
    graft.sources.Layout.writeZOrdered(load(s, dir, "lineitem"), out,
      Seq("l_partkey", "l_suppkey"), files = 8)
    s.read.parquet(out)
      .filter(col("l_partkey") < 200 && col("l_suppkey") < 40)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"),
        sum(col("l_orderkey")).cast("long").as("key_sum"))
  }

  private val cdcRowSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  // Debezium CDC decode + apply: a synthetic change log derived from
  // orders (snapshot read per key, an update for keys %3==0, a delete
  // for keys %7==0) is serialized to real Debezium envelope JSON,
  // decoded back with the typed schema, and replayed into current state
  // via the single-aggregate latest-per-key apply. The oracle computes
  // the expected end state directly from orders — proving the whole
  // to_json → from_json → apply loop lands on exactly the source rows.
  q("q_cdc_apply",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0""") { (s, dir) =>
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val row = struct(o.columns.map(col): _*)
    def env(payload: org.apache.spark.sql.Column) =
      to_json(struct(payload.as("payload"))).as("value")
    val snapshot = o.select(env(struct(row.as("after"),
      lit("r").as("op"), lit(1000L).as("ts_ms"))))
    val updates = o.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .select(env(struct(struct(o.columns.map(col): _*).as("after"),
        lit("u").as("op"), lit(2000L).as("ts_ms"))))
    val deletes = o.filter(col("o_orderkey") % 7 === 0)
      .select(env(struct(row.as("before"),
        lit("d").as("op"), lit(3000L).as("ts_ms"))))
    val events = snapshot.unionByName(updates).unionByName(deletes)
    val decoded = Cdc.decodeDebezium(events, col("value"), cdcRowSchema)
    Cdc.applyLatest(decoded, Seq("o_orderkey"), col("_ts_ms"))
  }

  // JDBC round-trip through embedded Derby (the one JDBC driver shipped
  // with Spark's jars): nation is written over a real JDBC connection,
  // read back through the io.jdbc wrapper, and oracle-compared to the
  // parquet original — the wrapper is an executed path, not a
  // format-string stub. Server databases (postgres et al.) differ only
  // in URL + driver jar.
  q("q_io_jdbc",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""") { (s, dir) =>
    System.setProperty("derby.stream.error.file", "/tmp/graft_io/derby.log")
    val db = s"${ioDir(dir)}/derby_nation"
    io.writeJdbc(load(s, dir, "nation").coalesce(1),
      s"jdbc:derby:$db;create=true", "nation_jdbc",
      options = Map("createTableColumnTypes" -> "n_name VARCHAR(64)"))
    io.jdbc(s, s"jdbc:derby:$db", "nation_jdbc", key = Seq("n_nationkey")).df
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
  }

  // Same change log and end state as q_cdc_apply, but EVERY event shares
  // one ts_ms — ordering falls entirely to the documented
  // struct(ts_ms, offset) recipe (Debezium only orders same-millisecond
  // events by log offset). Exercises the non-negating struct-order path
  // end-to-end; before round 7 this exact recipe failed analysis.
  q("q_cdc_tiebreak",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0""") { (s, dir) =>
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val row = struct(o.columns.map(col): _*)
    def env(payload: org.apache.spark.sql.Column, off: Long) = Seq(
      to_json(struct(payload.as("payload"))).as("value"),
      lit(off).as("offset"))
    val snapshot = o.select(env(struct(row.as("after"),
      lit("r").as("op"), lit(1000L).as("ts_ms")), 1L): _*)
    val updates = o.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .select(env(struct(struct(o.columns.map(col): _*).as("after"),
        lit("u").as("op"), lit(1000L).as("ts_ms")), 2L): _*)
    val deletes = o.filter(col("o_orderkey") % 7 === 0)
      .select(env(struct(row.as("before"),
        lit("d").as("op"), lit(1000L).as("ts_ms")), 3L): _*)
    val events = snapshot.unionByName(updates).unionByName(deletes)
    val decoded = Cdc.decodeDebezium(events, col("value"), cdcRowSchema)
    Cdc.applyLatest(decoded, Seq("o_orderkey"),
      struct(col("_ts_ms"), col("offset")))
  }

  /** q_cdc_apply's synthetic change log over orders — full snapshot at
    * order 1000, +1.0 updates for keys %3 at 2000, deletes for keys %7
    * at 3000 — replayed as three typed micro-batches through whichever
    * upsert sink `mkWriter` builds from the event stream. Shared by
    * q_upsert_snapshot and q_upsert_partitioned so the two sinks are
    * proven against the SAME workload; state+checkpoint under `root`
    * (fresh per invocation — a reused checkpoint would mark the replayed
    * offsets committed and skip them). */
  private def replayOrdersChangeLog(s: org.apache.spark.sql.SparkSession,
      dir: String)(mkWriter: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row]): Unit = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .as[(Long, Long, String, Double)].collect()
    type Ev = (Long, Long, Boolean, Long, String, Double)
    val snapshot: Seq[Ev] = o.toSeq.map(r => (r._1, 1000L, false, r._2, r._3, r._4))
    val updates: Seq[Ev] = o.toSeq.filter(_._1 % 3 == 0)
      .map(r => (r._1, 2000L, false, r._2, r._3, r._4 + 1.0))
    val deletes: Seq[Ev] = o.toSeq.filter(_._1 % 7 == 0)
      .map(r => (r._1, 3000L, true, r._2, r._3, r._4))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Boolean, Long, String, Double)]
    val events = in.toDF().toDF("o_orderkey", "_ord", "_del",
      "o_custkey", "o_orderstatus", "o_totalprice")
    val q = mkWriter(events).start()
    try {
      in.addData(snapshot); q.processAllAvailable()
      in.addData(updates); q.processAllAvailable()
      in.addData(deletes); q.processAllAvailable()
    } finally q.stop()
  }

  // The Delta-analog upsert sink driven to an ORACLE (previously
  // spec-only): the change log replayed through upsertParquetSink, then
  // the materialized snapshot read back via readSnapshot. End state must
  // equal the direct batch oracle over orders: proves the per-batch
  // latest-per-key fold, tombstone retention, and snapshot swap land on
  // exactly CDC-apply semantics.
  q("q_upsert_snapshot",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0""") { (s, dir) =>
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_q").toString
    replayOrdersChangeLog(s, dir) { events =>
      graft.streaming.Streaming.upsertParquetSink(events,
        Seq("o_orderkey"), "_ord", "_del", s"$root/state", s"$root/ckpt")
    }
    graft.streaming.Streaming.readSnapshot(s, s"$root/state", "_ord", "_del")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
  }

  // Version-retaining upsert sink, read AS-OF the middle batch (time
  // travel): the same change log through upsertParquetSinkVersioned,
  // then readSnapshotAsOf(version 2) — the state AFTER the +1.0 updates
  // but BEFORE the %7 deletes ever happened. The oracle derives that
  // historical state directly from orders, so the green row proves each
  // retained generation is a consistent batch-boundary snapshot, not
  // just that the latest one is.
  q("q_upsert_timetravel",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders""") { (s, dir) =>
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_tt").toString
    replayOrdersChangeLog(s, dir) { events =>
      graft.streaming.Streaming.upsertParquetSinkVersioned(events,
        Seq("o_orderkey"), "_ord", "_del", s"$root/state", s"$root/ckpt",
        keepVersions = 3)
    }
    graft.streaming.Streaming.readSnapshotAsOf(s, s"$root/state",
        "_ord", "_del", version = Some(2L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
  }

  // Change data feed between two retained snapshot versions (Delta
  // `table_changes` analog, derived from the states themselves): the
  // same 3-batch replay, then diff(v1 → v3) must emit exactly the
  // updates (pre+post image pairs for %3 keys that survived) and the
  // deletes (%7 keys, from-side image) the log applied in between —
  // nothing for untouched keys
  q("q_upsert_diff",
    """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |    o_totalprice FROM orders)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  'delete' AS _change_type FROM base WHERE o_orderkey % 7 = 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  'update_preimage' FROM base
      |WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1.0,
      |  'update_postimage' FROM base
      |WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0""") { (s, dir) =>
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_cdf").toString
    replayOrdersChangeLog(s, dir) { events =>
      graft.streaming.Streaming.upsertParquetSinkVersioned(events,
        Seq("o_orderkey"), "_ord", "_del", s"$root/state", s"$root/ckpt",
        keepVersions = 3)
    }
    graft.streaming.Streaming.snapshotDiff(s, s"$root/state",
      Seq("o_orderkey"), "_ord", "_del", fromVersion = 1L, toVersion = 3L)
  }

  // Bucket-partitioned upsert sink (the fact-sized-state variant: a
  // batch rewrites only the key-hash buckets it touches, not the whole
  // snapshot) replaying the exact q_upsert_snapshot change log — same
  // oracle, so the green row proves the incremental bucket merge + the
  // per-bucket swap land on byte-identical CDC-apply semantics. Note
  // this replay's batches touch EVERY bucket (the first batch is a full
  // snapshot), so it benches as a full rewrite plus bucket bookkeeping —
  // the incremental win (one key → one bucket) is what StreamingSpec
  // pins; this row is the correctness evidence.
  q("q_upsert_partitioned",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0""") { (s, dir) =>
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_pq").toString
    replayOrdersChangeLog(s, dir) { events =>
      graft.streaming.Streaming.upsertParquetSinkPartitioned(events,
        Seq("o_orderkey"), "_ord", "_del", s"$root/state", s"$root/ckpt",
        buckets = 16)
    }
    graft.streaming.Streaming.readSnapshotPartitioned(
        s, s"$root/state", "_ord", "_del")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
  }

  // Small-file compaction over the bucketed sink (Delta OPTIMIZE
  // analog): same change-log replay as q_upsert_partitioned, then
  // compactBuckets rewrites every multi-file bucket to one file via the
  // sink's atomic swap — and the read-back snapshot must STILL equal the
  // direct batch oracle, proving compaction is byte-level maintenance
  // with zero semantic footprint.
  q("q_upsert_compacted",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0""") { (s, dir) =>
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_cp").toString
    replayOrdersChangeLog(s, dir) { events =>
      graft.streaming.Streaming.upsertParquetSinkPartitioned(events,
        Seq("o_orderkey"), "_ord", "_del", s"$root/state", s"$root/ckpt",
        buckets = 16)
    }
    graft.streaming.Streaming.compactBuckets(s, s"$root/state")
    graft.streaming.Streaming.readSnapshotPartitioned(
        s, s"$root/state", "_ord", "_del")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
  }

  // Custom-source SPI executed end-to-end: a ConnectorSubject replays
  // nation through next()/commit() (driver-side feed — the subject
  // contract, like the reference's Python connector thread) and the
  // oracle proves the read-back table is exactly the source rows. The
  // 7-row commit cadence exercises multi-batch emission on the same path
  // the streaming mode uses.
  q("q_io_subject",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""") { (s, dir) =>
    import s.implicits._
    val rows = load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val subject = new graft.sources.ConnectorSubject[(Long, String, Long)] {
      def run(): Unit = rows.grouped(7).foreach { batch =>
        batch.foreach(next); commit()
      }
    }
    io.subjectStatic(s, subject, key = Seq("_1")).df
      .toDF("n_nationkey", "n_name", "n_regionkey")
  }

  // The DSv2 REPLAYABLE subject source driven to an ORACLE: nation is
  // recorded to a durable subject commit log in 7-row blocks, a
  // checkpointed streaming query drains the first tranche and STOPS (the
  // "crash"); more blocks are recorded while nothing is running; a
  // brand-new query on the SAME checkpoint must resume at the committed
  // block offset — the sink holding exactly the whole table proves the
  // MicroBatchStream's offsets survive restart (the contract the
  // MemoryStream bridge in io.subjectStream cannot give).
  q("q_io_subject_replay",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""") { (s, dir) =>
    import s.implicits._
    val nation = load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val rows = nation.as[(Long, String, Long)].collect().sortBy(_._1)
    val root = java.nio.file.Files.createTempDirectory("graft_sublog_q").toString
    val log = s"$root/log"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    def subjectOf(slice: Seq[(Long, String, Long)]) =
      new graft.sources.ConnectorSubject[(Long, String, Long)] {
        def run(): Unit = slice.grouped(7).foreach { b => b.foreach(next); commit() }
      }
    val (first, rest) = rows.splitAt(rows.length / 2)
    graft.sources.SubjectLog.record(s, subjectOf(first.toSeq), log)
    def drain() = {
      val q = graft.sources.SubjectLog.readStream(s, log)
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    drain() // crash mid-feed after the first tranche
    graft.sources.SubjectLog.record(s, subjectOf(rest.toSeq), log)
    drain() // restart on the SAME checkpoint
    // the sink's own (int64) schema — the source table may be narrower
    // (int32 at some SFs) and the driver compare normalizes widths
    s.read.parquet(out)
  }

  // A TYPED CDC envelope fed end-to-end through the replayable subject
  // log: events are (op, ts, after-struct, before-struct) rows — the
  // nested structs ride the r11 codec, no flattening — recorded in two
  // record() calls with a kill+restart of the consuming query between
  // them (the durable-offset contract), then replayed into current
  // state via the same single-aggregate apply as q_cdc_apply. Same
  // oracle: the whole subject → log → stream → apply loop must land on
  // exactly the q_cdc_apply end state.
  q("q_cdc_subject_log",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0""") { (s, dir) =>
    import s.implicits._
    val rows = load(s, dir, "orders")
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_orderstatus"), col("o_totalprice").cast("double"))
      .as[COrder].collect()
    val snapshot = rows.map(r => CEvent("r", 1000L, r, null))
    val updates = rows.filter(_.o_orderkey % 3 == 0)
      .map(r => CEvent("u", 2000L, r.copy(o_totalprice = r.o_totalprice + 1.0), null))
    val deletes = rows.filter(_.o_orderkey % 7 == 0)
      .map(r => CEvent("d", 3000L, null, r)) // deletes carry only before
    val root = java.nio.file.Files.createTempDirectory("graft_cdclog").toString
    val log = s"$root/log"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    def subjectOf(slice: Seq[CEvent]) =
      new graft.sources.ConnectorSubject[CEvent] {
        def run(): Unit = slice.grouped(4000).foreach { b => b.foreach(next); commit() }
      }
    def drain(): Unit = {
      val q = graft.sources.SubjectLog.readStream(s, log)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    graft.sources.SubjectLog.record(s, subjectOf(snapshot.toSeq), log)
    drain() // "crash" after the snapshot tranche
    graft.sources.SubjectLog.record(s, subjectOf((updates ++ deletes).toSeq), log)
    drain() // restart on the SAME checkpoint — no loss, no duplicates
    val decoded = s.read.schema(graft.sources.SubjectLog.read(s, log).schema)
      .parquet(out)
    Cdc.applyLatest(decoded, Seq("o_orderkey"), col("_ts_ms"))
  }

  // Streaming file source → parquet sink driven to an ORACLE (previously
  // IoSpec-only): nation is split into two parquet files dropped into the
  // watched directory ACROSS micro-batches (atomic rename into place, the
  // file-source contract), streamed through the io wrappers into an
  // append parquet sink, and the sink's accumulated output must equal the
  // whole table — proving incremental pickup, exactly-once file
  // processing, and writer/reader byte agreement in one pass.
  q("q_io_filestream",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""") { (s, dir) =>
    val root = java.nio.file.Files.createTempDirectory("graft_fstream").toString
    val src = s"$root/in"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val nation = load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    dropParquetInto(root, src)(nation.filter(col("n_nationkey") < 12), "part1")
    val stream = io.stream(s, "parquet", nation.schema).load(src)
    val q = io.writeStream(stream, out, s"$root/ckpt").start()
    try {
      q.processAllAvailable()
      dropParquetInto(root, src)(nation.filter(col("n_nationkey") >= 12), "part2")
      q.processAllAvailable()
    } finally q.stop()
    s.read.schema(nation.schema).parquet(out)
  }

  /** Write `part` as one parquet file aside, then atomically rename it
    * into the watched dir `src` — the file-source visibility contract
    * (a file must appear complete). Shared by q_io_filestream and
    * q_recovery. */
  private def dropParquetInto(root: String, src: String)(
      part: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val tmp = s"$root/tmp_$tag"
    part.coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(s"$src/$tag.parquet"))
  }

  // Schema column properties driven to an ORACLE (reference:
  // internals/schema.py:913 — primary_key / default_value; previously
  // TestkitSpec-only): negative balances are NULLed out of the input,
  // `Schema.apply` must refill them from the declared default and
  // conjure the entirely-missing c_segment column from its default.
  q("q_schema_apply",
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal,
      |  'UNKNOWN' AS c_segment
      |FROM customer""") { (s, dir) =>
    import graft.core.{ColumnDef, Schema}
    val holed = load(s, dir, "customer").select(col("c_custkey"),
      when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal"))
        .as("c_acctbal"))
    val schema = Schema.of(
      ColumnDef("c_custkey", LongType, primaryKey = true),
      ColumnDef("c_acctbal", DoubleType, default = Some(0.0)),
      ColumnDef("c_segment", StringType, default = Some("UNKNOWN")))
    schema(holed).df
  }

  // schema_from_csv inference driven to an ORACLE (reference:
  // internals/schema.py:832; previously TestkitSpec-only): nation written
  // as csv, the schema INFERRED from a bounded sample, the file read back
  // under the inferred schema — name or type drift would break the
  // compare. Integer width is normalized to BIGINT on both sides
  // (Spark infers int32 where DuckDB infers int64).
  q("q_schema_csv",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""") { (s, dir) =>
    import graft.core.Schema
    val path = s"${ioDir(dir)}/nation_schema_csv"
    load(s, dir, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    val inferred = Schema.fromCsv(s, path, header = true,
      primaryKey = Seq("n_nationkey"))
    val back = s.read.schema(inferred.structType)
      .option("header", "true").csv(path)
    inferred(back).df
      .select(col("n_nationkey").cast("bigint"), col("n_name"),
        col("n_regionkey").cast("bigint"))
  }

  // checkpoint recovery driven to an ORACLE (reference: src/persistence/,
  // test_recovery.py; previously StreamingSpec-only): the first query
  // processes file 1 and STOPS (the "crash"); a brand-new query on the
  // SAME checkpoint must skip the already-committed file and pick up only
  // file 2 — the sink holding the whole table exactly once proves
  // no-loss, no-duplication recovery.
  q("q_recovery",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""") { (s, dir) =>
    val root = java.nio.file.Files.createTempDirectory("graft_recov").toString
    val src = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val nation = load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    dropParquetInto(root, src)(nation.filter(col("n_nationkey") < 12), "part1")
    val q1 = io.writeStream(
      io.stream(s, "parquet", nation.schema).load(src), out, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    dropParquetInto(root, src)(nation.filter(col("n_nationkey") >= 12), "part2")
    val q2 = io.writeStream(
      io.stream(s, "parquet", nation.schema).load(src), out, ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    s.read.schema(nation.schema).parquet(out)
  }

  // subscribe callback sink driven to an ORACLE (reference:
  // pw.io.subscribe, io/_subscribe.py; previously StreamingSpec-only):
  // the callback drains each micro-batch into a driver-side buffer; the
  // buffer rebuilt as a DataFrame across two commits must equal the
  // table.
  q("q_subscribe",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""") { (s, dir) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .as[(Long, String, Long)].collect()
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = graft.streaming.Streaming.subscribe(
      in.toDF().toDF("n_nationkey", "n_name", "n_regionkey"),
      (batch, _) => batch.collect().foreach(r =>
        buf.add((r.getLong(0), r.getString(1), r.getLong(2))))).start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toSeq); q.processAllAvailable()
      in.addData(b.toSeq); q.processAllAvailable()
    } finally q.stop()
    scala.jdk.CollectionConverters.CollectionHasAsScala(buf).asScala.toSeq
      .toDF("n_nationkey", "n_name", "n_regionkey")
  }

  // HTTP polling source driven to an ORACLE (reference: pw.io.http;
  // previously IoSpec-only): a live local endpoint serves the nation
  // table as a JSON array; the polled bodies parsed + exploded +
  // deduplicated must equal the table read directly — real sockets, real
  // fetches, engine-independent result.
  q("q_io_http",
    """SELECT n_nationkey, n_name FROM nation""") { (s, dir) =>
    val nation = load(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val body = nation.toJSON.collect().mkString("[", ",", "]")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/nation", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    val q = io.httpPoll(s,
        s"http://127.0.0.1:${srv.getAddress.getPort}/nation", pollsPerSecond = 5)
      .writeStream.format("memory").queryName("http_oracle_out")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def ok() = s.sql("SELECT * FROM http_oracle_out WHERE status = 200").count()
      while (ok() < 1 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
    } finally { q.stop(); srv.stop(0) }
    s.table("http_oracle_out").filter(col("status") === 200)
      .select(explode(from_json(col("body"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "array<struct<n_nationkey: bigint, n_name: string>>"))).as("r"))
      .select(col("r.n_nationkey").as("n_nationkey"), col("r.n_name").as("n_name"))
      .distinct()
  }

  q("q_io_text",
    """SELECT value FROM read_csv('/tmp/graft_io/sf0.01/nation_txt/*.txt',
      |  delim='', quote='', escape='', header=false,
      |  columns={'value': 'VARCHAR'})""") { (s, dir) =>
    val out = s"${ioDir(dir)}/nation_txt"
    io.write(load(s, dir, "nation").select(col("n_name")).coalesce(1),
      out, "text")
    io.plaintext(s, out).df
  }
}
