package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.io

/** fs connector round-trips (reference: python/pathway/io/fs). */
class IoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_io_$name")
    d.toFile.deleteOnExit(); d.toString + "/data"
  }

  private val df = Seq((1L, "alpha", 1.5), (2L, "beta, with comma", 2.5),
    (3L, "gamma \"quoted\"", -0.25)).toDF("id", "name", "score")
  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("name", StringType), StructField("score", DoubleType)))

  test("csv round-trip preserves rows incl. delimiters and quotes") {
    val p = tmp("csv")
    io.write(df, p, "csv", options = Map("header" -> "true"))
    val back = io.csv(spark, p, schema = schema, key = Seq("id"))
    assert(back.key == Seq("id"))
    assert(rowsOf(back.df) == rowsOf(df))
  }

  test("csv infers schema when none is given") {
    val p = tmp("csv_infer")
    io.write(df, p, "csv", options = Map("header" -> "true"))
    val back = io.csv(spark, p)
    assert(back.df.schema.fields.map(_.name).toSeq == Seq("id", "name", "score"))
    assert(rowsOf(back.df) == rowsOf(df))
  }

  test("jsonlines round-trip preserves rows and types") {
    val p = tmp("json")
    io.write(df, p, "json")
    val back = io.jsonlines(spark, p, schema = schema, key = Seq("id"))
    assert(rowsOf(back.df) == rowsOf(df))
  }

  test("plaintext reads lines as value column") {
    val p = tmp("text")
    io.write(df.select(col("name")), p, "text")
    val back = io.plaintext(spark, p)
    assert(back.df.columns.toSeq == Seq("value"))
    assert(rowsOf(back.df) == rowsOf(df.select(col("name").as("value"))))
  }

  test("binary reads files with path/length/content metadata") {
    val p = tmp("bin")
    io.write(df.select(col("name")), p, "text")
    val back = io.binary(spark, p + "/*.txt")
    val cols = back.df.columns.toSet
    assert(Set("path", "modificationTime", "length", "content").subsetOf(cols))
    assert(back.df.count() >= 1)
    val content = back.df.agg(sum(length(col("content")))).head.getLong(0)
    assert(content > 0)
  }

  test("parquet round-trip with key") {
    val p = tmp("parquet")
    io.write(df, p, "parquet")
    val back = io.parquet(spark, p, key = Seq("id"))
    assert(back.key == Seq("id") && rowsOf(back.df) == rowsOf(df))
  }

  test("streaming file source picks up files incrementally") {
    // the reference's fs connector in streaming mode watches a directory
    // (ConnectorMode.Streaming); Spark's file stream source is the same
    // contract — each new file becomes a micro-batch
    val dir = tmp("stream_json")
    io.write(df.filter(col("id") <= 2), dir + "/batch0", "json")
    // file source reads a directory of files; point it at the dir glob
    val src = io.stream(spark, "json", schema = schema)
      .load(dir + "/*/")
    val q = src.writeStream.format("memory").queryName("io_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM io_stream").count() == 2)
      // a new file arrives → picked up incrementally, no re-read of old
      io.write(df.filter(col("id") === 3), dir + "/batch1", "json")
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, name, score FROM io_stream")
      assert(rowsOf(rows) == rowsOf(df))
    } finally q.stop()
  }

  test("streaming parquet sink via io.writeStream with checkpoint") {
    val in = tmp("sink_in")
    val out = tmp("sink_out")
    val ckpt = tmp("sink_ckpt")
    io.write(df, in + "/b0", "json")
    val src = io.stream(spark, "json", schema = schema).load(in + "/*/")
    val q = io.writeStream(src, out, checkpoint = ckpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(rowsOf(io.parquet(spark, out, key = Seq("id")).df) == rowsOf(df))
    // checkpoint directory was actually used (offsets recorded)
    assert(new java.io.File(ckpt, "offsets").list().nonEmpty)
  }

  test("httpPoll streams periodic GETs of a live endpoint") {
    // serve a real local endpoint with the JDK http server
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    srv.createContext("/data", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = s"""{"n":${hits.incrementAndGet()}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    val q = io.httpPoll(spark,
        s"http://127.0.0.1:${srv.getAddress.getPort}/data", pollsPerSecond = 5)
      .writeStream.format("memory").queryName("http_poll").outputMode("append")
      .start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      def n() = spark.sql("SELECT * FROM http_poll WHERE status = 200").count()
      while (n() < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
      assert(n() >= 2, "expected at least two successful polls")
      val bodies = spark.sql("SELECT body FROM http_poll WHERE status = 200")
        .collect().map(_.getString(0))
      assert(bodies.forall(_.startsWith("{\"n\":")))
      assert(hits.get() >= 2) // the server really served the fetches
    } finally { q.stop(); srv.stop(0) }
  }
}
