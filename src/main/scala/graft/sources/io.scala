package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StructType
import graft.core.Table

/** Source/sink layer (reference: python/pathway/io — fs, csv,
  * jsonlines, plaintext, parquet, kafka, delta, jdbc/postgres, debezium;
  * engine src/connectors/data_storage.rs:289).
  *
  * Spark's DataSource V2 registry IS the connector framework — every
  * reference connector maps onto a format string + options, in both
  * static and streaming modes (reference ConnectorMode
  * data_storage.rs:815 ≙ read vs readStream). These wrappers pin the
  * graft conventions: schema-explicit reads, keyed Tables out, append/
  * complete sinks with checkpoints.
  *
  * | reference connector | format here |
  * |---|---|
  * | fs csv/json/plaintext/binary | csv / json / text / binaryFile |
  * | parquet, deltalake | parquet, delta (jar-dependent) |
  * | kafka / redpanda / debezium | kafka (+ from_json on value) |
  * | postgres / sqlite / mongodb | jdbc (driver-dependent) |
  * | python ConnectorSubject | [[subjectStatic]] / [[subjectStream]] |
  * | pw.io.subscribe | foreachBatch ([[graft.streaming.Streaming.subscribe]]) |
  */
object io {

  def csv(spark: SparkSession, path: String, schema: StructType = null,
      header: Boolean = true, key: Seq[String] = Nil): Table = {
    val r = spark.read.option("header", header.toString)
    val df = (if (schema != null) r.schema(schema) else r.option("inferSchema", "true")).csv(path)
    Table.fromDF(df, key)
  }

  def jsonlines(spark: SparkSession, path: String, schema: StructType = null,
      key: Seq[String] = Nil): Table = {
    val r = spark.read
    Table.fromDF((if (schema != null) r.schema(schema) else r).json(path), key)
  }

  def plaintext(spark: SparkSession, path: String): Table =
    Table.fromDF(spark.read.text(path), Nil)

  def binary(spark: SparkSession, path: String): Table =
    Table.fromDF(spark.read.format("binaryFile").load(path), Seq("path"))

  def parquet(spark: SparkSession, path: String, key: Seq[String] = Nil): Table =
    Table.fromDF(spark.read.parquet(path), key)

  /** JDBC read (reference: psql/sqlite/mongodb connectors,
    * data_storage.rs:1072 PsqlWriter's read twin). Any DriverManager URL
    * whose driver jar is on the classpath; pass
    * partitionColumn/lowerBound/upperBound/numPartitions in `options` to
    * parallelize the scan across executors (one JDBC cursor per
    * partition — without them the read is a single cursor, fine for dim
    * tables only). Executed in-tree against embedded Derby (IoQueries
    * q_io_jdbc); server databases differ only in the URL. */
  def jdbc(spark: SparkSession, url: String, tableName: String,
      options: Map[String, String] = Map.empty, key: Seq[String] = Nil): Table =
    Table.fromDF(spark.read.format("jdbc")
      .option("url", url).option("dbtable", tableName)
      .options(options).load(), key)

  /** JDBC write (reference: PsqlWriter data_storage.rs:1072). `mode`
    * follows Spark semantics: overwrite drops/recreates, append inserts.
    * Writes run one connection per partition — `df.coalesce(n)` first if
    * the target can't take the fan-in. */
  def writeJdbc(df: DataFrame, url: String, tableName: String,
      mode: String = "overwrite", options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc").option("url", url).option("dbtable", tableName)
      .options(options).mode(mode).save()

  /** HTTP polling source (reference: pw.io.http REST connector —
    * periodic GET of an endpoint into a stream). Spark-first mapping:
    * the rate source provides the tick cadence and checkpointable
    * offsets; each tick fetches the URL once via the JDK HttpClient
    * (executor-side, no driver I/O) and emits
    * (tick_time, status, body). Payload parsing (from_json etc.) is the
    * caller's next transform, matching the reference's format layer.
    * One fetch per tick — poll fan-out across a URL LIST can map each
    * rate row to `urls(value % n)` instead. */
  /** One JDK HttpClient per executor JVM: module init happens on first
    * use executor-side, so every poll tick reuses the same client (and
    * its connection pool) instead of paying a fresh client + handshake
    * per tick (ADVICE r8 minor). */
  private object HttpClients {
    lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newHttpClient()
  }

  def httpPoll(spark: SparkSession, url: String,
      pollsPerSecond: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    val fetch = udf { () =>
      try {
        val resp = HttpClients.client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      } catch { case e: Exception => (-1, e.toString) }
    }.asNondeterministic()
    spark.readStream.format("rate")
      .option("rowsPerSecond", math.max(1, pollsPerSecond)).load()
      .withColumn("_r", fetch())
      .select(col("timestamp").as("tick_time"),
        col("_r._1").as("status"), col("_r._2").as("body"))
  }

  /** Bounded read of a [[ConnectorSubject]]: `run()` executes to
    * completion driver-side, the emitted rows become a keyed [[Table]]
    * (reference: pw.io.python.read in static mode,
    * __init__.py:349 + ConnectorMode::Static data_storage.rs:815). */
  def subjectStatic[T: org.apache.spark.sql.Encoder](spark: SparkSession,
      subject: ConnectorSubject[T], key: Seq[String] = Nil): Table =
    ConnectorSubject.staticRead(spark, subject, key)

  /** Unbounded read of a [[ConnectorSubject]]: `run()` executes on a
    * feeder thread, each `commit` publishes a block into a MemoryStream
    * micro-batch source (reference: streaming-mode read, the `*COMMIT*`
    * channel literal __init__.py:41). Dev/test/control-plane transport —
    * the in-process analog of the reference's Python subject; a
    * replayable production source wants a DSv2 implementation instead. */
  def subjectStream[T: org.apache.spark.sql.Encoder](spark: SparkSession,
      subject: ConnectorSubject[T]): ConnectorSubject.SubjectStream =
    ConnectorSubject.streamingRead(spark, subject)

  /** Streaming variants (reference streaming mode connectors). */
  def stream(spark: SparkSession, format: String, schema: StructType = null,
      options: Map[String, String] = Map.empty): DataStreamReader = {
    val r = spark.readStream.format(format).options(options)
    if (schema != null) r.schema(schema) else r
  }

  def write(df: DataFrame, path: String, format: String = "parquet",
      mode: String = "overwrite", partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format(format).mode(mode).options(options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  def writeStream(df: DataFrame, path: String, checkpoint: String,
      format: String = "parquet", outputMode: String = "append") =
    df.writeStream.format(format).outputMode(outputMode)
      .option("path", path).option("checkpointLocation", checkpoint)
}
