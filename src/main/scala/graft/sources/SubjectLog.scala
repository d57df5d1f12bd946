package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Base64

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.{JsonFactory, JsonGenerator, JsonParser, JsonToken}

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.encoderFor
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, SpecializedGetters}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, TableCapability, TableProvider, Table => DsTable}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Durable, REPLAYABLE commit log for [[ConnectorSubject]] feeds
  * (reference: the persistence layer's input snapshots,
  * src/persistence/input_snapshot.rs + backends/, which make Python
  * connector reads survive restart — `io.subjectStream`'s MemoryStream
  * bridge cannot: MemoryStream offsets are not re-servable after a crash,
  * so a checkpointed query dies on restart mid-feed).
  *
  * Split into the two halves the reference's persistence also has:
  *
  *  - [[SubjectLog.record]] drives a subject and appends each `commit`
  *    block ATOMICALLY to a log directory (`block-NNNNNNNN.jsonl`, one
  *    JSON array of column values per row, plus `_schema.json`; blocks
  *    are written aside and atomically renamed into place, and numbering
  *    resumes across record calls, so a reader never observes a partial
  *    or out-of-order block);
  *  - [[SubjectLogSource]] is a DataSource V2 `TableProvider` whose
  *    `MicroBatchStream` serves blocks as micro-batches with offsets =
  *    block count. Offsets are just positions in the durable log, so a
  *    restarted query re-plans exactly the uncommitted suffix — the
  *    kill+restart contract the MemoryStream bridge lacks (no loss, no
  *    duplicates; StreamingSpec pins it). `BATCH_READ` serves the whole
  *    log as a bounded table for backfills.
  *
  * Scale shape: the feed side is a single driver-side producer (the
  * subject contract — control planes, test rigs, slow external APIs, not
  * bulk data); the READ side is fully distributed — one input partition
  * per block, read in parallel by executors. Like every file-backed
  * source, the log dir must live on storage all executors can reach
  * (DFS/NFS on a real cluster; local fs under local[*]).
  *
  * Supported column types: the primitive/temporal/binary/string/decimal
  * types plus arrays, nested structs AND maps of them (structs encode as
  * nested JSON arrays; maps as a [keys…][values…] array pair —
  * positional like everything else, so key types are not restricted to
  * strings the way a JSON-object encoding would force) — matching the
  * typed-row values the reference's Python subject `next(**kwargs)`
  * accepts, so a typed CDC envelope (op, ts, before/after row structs,
  * tag maps) feeds through the log without flattening.
  * [[SubjectLogCodec.validate]] rejects anything else loudly at record
  * time.
  *
  * Retention: blocks are retained for replay/backfill until
  * [[vacuumBlocks]] prunes a prefix — the explicit maintenance decision
  * mirroring the upsert sink's vacuum. The pruned horizon is pinned in a
  * `_horizon` marker; reads start there, and a checkpoint that predates
  * it fails loudly instead of silently skipping rows.
  */
object SubjectLog {

  private[sources] val BlockPattern = "block-(\\d{8})\\.jsonl".r

  private def schemaPath(dir: String): Path = Paths.get(dir, "_schema.json")

  private def horizonPath(dir: String): Path = Paths.get(dir, "_horizon")

  private[sources] def blockFile(dir: String, i: Long): Path =
    Paths.get(dir, f"block-$i%08d.jsonl")

  /** First retained block index: the [[vacuumBlocks]] horizon (0 when
    * never vacuumed). Offsets below it are un-servable. */
  private[sources] def horizonOf(dir: String): Long = {
    val p = horizonPath(dir)
    if (Files.exists(p)) Files.readString(p).trim.toLong else 0L
  }

  /** Count of CONTIGUOUS durable blocks [horizon, n) — the replayable
    * frontier. Atomic single-writer renames make gaps impossible in
    * normal operation; counting contiguously anyway means a stray
    * future-named file can only delay, never corrupt, the offset
    * sequence. */
  private[sources] def contiguousBlocks(dir: String): Long = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) return 0L
    val present = d.list().collect { case BlockPattern(n) => n.toLong }.toSet
    var i = horizonOf(dir)
    while (present(i)) i += 1
    i
  }

  /** Prune every durable block below `horizon` — the retention half of
    * the commit log (an unbounded control feed must not grow the log
    * forever; reference: the persistence layer compacts input snapshots
    * the same explicit-maintenance way). The marker is flipped FIRST
    * (write-aside + atomic rename), so a crash mid-vacuum leaves a
    * fully-declared horizon with some prunable files still on disk —
    * the next vacuum or any read is unaffected (reads never look below
    * the marker).
    *
    * Contract with consumers: a checkpointed query whose committed
    * offset is ≥ horizon restarts cleanly; one parked BELOW the horizon
    * fails loudly at planInputPartitions (its data is gone — silent
    * skipping would violate the replay guarantee). Pick horizons the
    * way the upsert sink's vacuum picks them: no later than the oldest
    * offset any consumer may still need. The horizon may not exceed the
    * durable frontier. */
  def vacuumBlocks(dir: String, horizon: Long): Unit = {
    val frontier = contiguousBlocks(dir)
    require(horizon <= frontier,
      s"SubjectLog.vacuumBlocks: horizon $horizon exceeds the durable " +
        s"frontier $frontier at $dir")
    val old = horizonOf(dir)
    if (horizon > old) {
      val root = Paths.get(dir)
      val tmp = root.resolve(s".tmp-horizon-${java.util.UUID.randomUUID()}")
      Files.writeString(tmp, horizon.toString)
      Files.move(tmp, horizonPath(dir), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      // delete by LISTING, not by the [old, horizon) range: a crash
      // after a previous vacuum's marker flip but before its deletes
      // leaves sub-`old` files a range-based sweep would never revisit
      new java.io.File(dir).list()
        .collect { case name @ BlockPattern(n) if n.toLong < horizon => name }
        .foreach(name => Files.deleteIfExists(root.resolve(name)))
    }
  }

  private[sources] def schemaOf(dir: String): StructType = {
    val p = schemaPath(dir)
    require(Files.exists(p),
      s"SubjectLog: no _schema.json under $dir — record() a subject first")
    DataType.fromJson(Files.readString(p)).asInstanceOf[StructType]
  }

  /** Drive `subject` to completion (driver-side, blocking — the subject
    * contract), appending one durable block per `commit`. Numbering
    * resumes from the existing log, so successive record() calls append;
    * the schema must match the log's. Empty commits are skipped. */
  def record[T](spark: SparkSession, subject: ConnectorSubject[T],
      dir: String)(implicit enc: Encoder[T]): Unit = {
    subject.claim()
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val schema = enc.schema
    SubjectLogCodec.validate(schema)
    val sp = schemaPath(dir)
    if (Files.exists(sp)) {
      val existing = DataType.fromJson(Files.readString(sp))
      require(existing == schema,
        s"SubjectLog.record: schema mismatch with existing log at $dir — " +
          s"log has $existing, subject emits $schema")
    } else {
      val tmp = root.resolve(s".tmp-schema-${java.util.UUID.randomUUID()}")
      Files.writeString(tmp, schema.json)
      Files.move(tmp, sp, StandardCopyOption.ATOMIC_MOVE)
    }
    val toRow = encoderFor(enc).createSerializer()
    var nextBlock = contiguousBlocks(dir)
    val pending = ArrayBuffer[String]()
    subject.feed = new ConnectorSubject.Feed[T] {
      def next(row: T): Unit = pending += SubjectLogCodec.rowToJson(toRow(row), schema)
      def commit(): Unit = if (pending.nonEmpty) {
        val tmp = root.resolve(s".tmp-$nextBlock-${java.util.UUID.randomUUID()}")
        Files.write(tmp, pending.asJava, StandardCharsets.UTF_8)
        Files.move(tmp, blockFile(dir, nextBlock), StandardCopyOption.ATOMIC_MOVE)
        nextBlock += 1
        pending.clear()
      }
    }
    try { subject.run(); subject.feed.commit() } finally subject.onStop()
  }

  /** Replayable unbounded read of a subject log — checkpoint a sink on
    * this and a restarted query resumes at the committed block. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format(classOf[SubjectLogSource].getName).load(dir)

  /** Bounded read of everything recorded so far (backfills, oracles). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format(classOf[SubjectLogSource].getName).load(dir)
}

/** Row codec for the subject log: one JSON array of column values per
  * line, values encoded from/to Spark INTERNAL representations (µs longs
  * for timestamps, day ints for dates, base64 for binary, plain-string
  * decimals, nested arrays for structs) so the round-trip is exact — no
  * string-formatted temporal or decimal ambiguity. */
private[sources] object SubjectLogCodec {

  private val factory = new JsonFactory()

  def validate(dt: DataType): Unit = dt match {
    case s: StructType => s.fields.foreach(f => validate(f.dataType))
    case ArrayType(et, _) => validate(et)
    case MapType(kt, vt, _) => validate(kt); validate(vt)
    case StringType | LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType | BinaryType | DateType |
         TimestampType | TimestampNTZType => ()
    case _: DecimalType => ()
    case other => throw new IllegalArgumentException(
      s"SubjectLog: unsupported column type $other — supported: " +
        "string/integral/floating/boolean/binary/date/timestamp/decimal " +
        "plus arrays, maps and nested structs thereof")
  }

  def rowToJson(row: InternalRow, schema: StructType): String = {
    val sw = new java.io.StringWriter()
    val gen = factory.createGenerator(sw)
    gen.writeStartArray()
    var i = 0
    while (i < schema.length) {
      writeValue(gen, row, i, schema.fields(i).dataType)
      i += 1
    }
    gen.writeEndArray()
    gen.close()
    sw.toString
  }

  private def writeValue(gen: JsonGenerator, g: SpecializedGetters, i: Int,
      dt: DataType): Unit =
    if (g.isNullAt(i)) gen.writeNull()
    else dt match {
      case StringType => gen.writeString(g.getUTF8String(i).toString)
      case LongType | TimestampType | TimestampNTZType => gen.writeNumber(g.getLong(i))
      case IntegerType | DateType => gen.writeNumber(g.getInt(i))
      case ShortType => gen.writeNumber(g.getShort(i).toInt)
      case ByteType => gen.writeNumber(g.getByte(i).toInt)
      // Jackson quotes non-finite doubles ("NaN"/"Infinity") by default;
      // the reader's parse accepts both tokens
      case DoubleType => gen.writeNumber(g.getDouble(i))
      case FloatType => gen.writeNumber(g.getFloat(i))
      case BooleanType => gen.writeBoolean(g.getBoolean(i))
      case BinaryType => gen.writeString(Base64.getEncoder.encodeToString(g.getBinary(i)))
      // decimals travel as their exact plain-string form — a JSON number
      // would round-trip through double and lose low digits
      case d: DecimalType => gen.writeString(
        g.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString)
      case ArrayType(et, _) =>
        val arr = g.getArray(i)
        gen.writeStartArray()
        var j = 0
        while (j < arr.numElements()) { writeValue(gen, arr, j, et); j += 1 }
        gen.writeEndArray()
      // nested struct = nested JSON array of its fields, the same
      // positional encoding as the top-level row
      case st: StructType =>
        val row = g.getStruct(i, st.length)
        gen.writeStartArray()
        var j = 0
        while (j < st.length) { writeValue(gen, row, j, st.fields(j).dataType); j += 1 }
        gen.writeEndArray()
      // map = [[keys…],[values…]] — positional, so non-string keys (a
      // JSON-object encoding would stringify them) round-trip typed
      case MapType(kt, vt, _) =>
        val m = g.getMap(i)
        val ks = m.keyArray(); val vs = m.valueArray()
        gen.writeStartArray()
        gen.writeStartArray()
        var j = 0
        while (j < ks.numElements()) { writeValue(gen, ks, j, kt); j += 1 }
        gen.writeEndArray()
        gen.writeStartArray()
        j = 0
        while (j < vs.numElements()) { writeValue(gen, vs, j, vt); j += 1 }
        gen.writeEndArray()
        gen.writeEndArray()
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  def jsonToRow(line: String, schema: StructType): InternalRow = {
    val p = factory.createParser(line)
    require(p.nextToken() == JsonToken.START_ARRAY,
      s"SubjectLog: corrupt block line (not a JSON array): $line")
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      p.nextToken()
      vals(i) = readValue(p, schema.fields(i).dataType)
      i += 1
    }
    p.close()
    new GenericInternalRow(vals)
  }

  private def readValue(p: JsonParser, dt: DataType): Any =
    if (p.currentToken() == JsonToken.VALUE_NULL) null
    else dt match {
      case StringType => UTF8String.fromString(p.getText)
      case LongType | TimestampType | TimestampNTZType => p.getLongValue
      case IntegerType | DateType => p.getIntValue
      case ShortType => p.getIntValue.toShort
      case ByteType => p.getIntValue.toByte
      case DoubleType =>
        if (p.currentToken() == JsonToken.VALUE_STRING) p.getText.toDouble
        else p.getDoubleValue
      case FloatType =>
        if (p.currentToken() == JsonToken.VALUE_STRING) p.getText.toFloat
        else p.getFloatValue
      case BooleanType => p.getBooleanValue
      case BinaryType => Base64.getDecoder.decode(p.getText)
      case d: DecimalType =>
        Decimal(new java.math.BigDecimal(p.getText), d.precision, d.scale)
      case ArrayType(et, _) =>
        val buf = ArrayBuffer[Any]()
        while (p.nextToken() != JsonToken.END_ARRAY) buf += readValue(p, et)
        new GenericArrayData(buf.toArray)
      case st: StructType =>
        val vals = new Array[Any](st.length)
        var j = 0
        while (j < st.length) {
          p.nextToken()
          vals(j) = readValue(p, st.fields(j).dataType)
          j += 1
        }
        require(p.nextToken() == JsonToken.END_ARRAY,
          s"SubjectLog: corrupt nested struct (missing end of array)")
        new GenericInternalRow(vals)
      case MapType(kt, vt, _) =>
        require(p.nextToken() == JsonToken.START_ARRAY,
          s"SubjectLog: corrupt map (missing keys array)")
        val ks = ArrayBuffer[Any]()
        while (p.nextToken() != JsonToken.END_ARRAY) ks += readValue(p, kt)
        require(p.nextToken() == JsonToken.START_ARRAY,
          s"SubjectLog: corrupt map (missing values array)")
        val vs = ArrayBuffer[Any]()
        while (p.nextToken() != JsonToken.END_ARRAY) vs += readValue(p, vt)
        require(p.nextToken() == JsonToken.END_ARRAY,
          s"SubjectLog: corrupt map (missing end of array)")
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new GenericArrayData(ks.toArray), new GenericArrayData(vs.toArray))
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
}

/** DataSource V2 provider over a [[SubjectLog]] directory. Use via
  * `spark.readStream.format("graft-subject-log").load(dir)` (registered
  * through DataSourceRegister) or [[SubjectLog.readStream]]. */
class SubjectLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-subject-log"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-subject-log: .load(dir) required")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SubjectLog.schemaOf(pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): DsTable =
    new SubjectLogTable(schema, properties.get("path"))
}

private[sources] class SubjectLogTable(tableSchema: StructType, dir: String)
    extends DsTable with SupportsRead {
  override def name(): String = s"graft-subject-log(`$dir`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SubjectLogScan(tableSchema, dir)
    }
}

private[sources] class SubjectLogScan(tableSchema: StructType, dir: String) extends Scan {
  override def readSchema(): StructType = tableSchema

  private def partitionsFor(from: Long, until: Long): Array[InputPartition] = {
    // a vacuumed prefix is GONE: a restart whose checkpoint predates the
    // horizon must fail loudly — silently skipping to the horizon would
    // break the replay guarantee the log exists for
    val horizon = SubjectLog.horizonOf(dir)
    require(from >= horizon,
      s"SubjectLog: offset $from predates the vacuum horizon $horizon at " +
        s"$dir — the blocks were pruned; restart from a checkpoint at or " +
        "after the horizon (or re-record)")
    (from until until)
      .map(i => SubjectLogPartition(SubjectLog.blockFile(dir, i).toString)
        : InputPartition)
      .toArray
  }

  override def toBatch: Batch = new Batch {
    // snapshot horizon + frontier once at planning so the bounded read
    // is a consistent retained range even while a recorder is appending
    // or a vacuum is pruning
    private val horizon = SubjectLog.horizonOf(dir)
    private val frontier = SubjectLog.contiguousBlocks(dir)
    override def planInputPartitions(): Array[InputPartition] =
      partitionsFor(horizon, frontier)
    override def createReaderFactory(): PartitionReaderFactory =
      new SubjectLogReaderFactory(tableSchema)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      // a FRESH query starts at the horizon (earlier blocks are pruned);
      // a restarted query replays from its checkpoint, which the horizon
      // check above validates
      override def initialOffset(): Offset =
        SubjectLogOffset(SubjectLog.horizonOf(dir))
      override def latestOffset(): Offset =
        SubjectLogOffset(SubjectLog.contiguousBlocks(dir))
      override def deserializeOffset(json: String): Offset =
        SubjectLogOffset(json.trim.toLong)
      // blocks are retained for replay/backfill; pruning is an explicit
      // maintenance decision ([[SubjectLog.vacuumBlocks]], mirror of the
      // upsert sink's vacuum), not a side effect of one query's progress
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        partitionsFor(start.asInstanceOf[SubjectLogOffset].block,
          end.asInstanceOf[SubjectLogOffset].block)
      override def createReaderFactory(): PartitionReaderFactory =
        new SubjectLogReaderFactory(tableSchema)
    }
}

/** Offset = count of consumed blocks; its json form is the number, so
  * checkpoints are human-auditable. */
private[sources] case class SubjectLogOffset(block: Long) extends Offset {
  override def json(): String = block.toString
}

private[sources] case class SubjectLogPartition(file: String) extends InputPartition

private[sources] class SubjectLogReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val lines = Files.readAllLines(
        Paths.get(partition.asInstanceOf[SubjectLogPartition].file),
        StandardCharsets.UTF_8).iterator()
      private var current: InternalRow = _
      override def next(): Boolean =
        if (lines.hasNext) {
          current = SubjectLogCodec.jsonToRow(lines.next(), schema); true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
