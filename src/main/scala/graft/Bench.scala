package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line. Caches are cleared between
  * queries so each measurement is isolated (several operators cache
  * intermediates; letting them accumulate distorts later queries via
  * storage-memory pressure). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table (OS page cache + parquet footers), then
    // run EVERY query once at the smallest SF — same codegen/JIT paths,
    // negligible data. Timed runs then measure steady-state compute (the
    // long-lived-cluster regime), not JVM warmup: cold-vs-warm for the
    // heavy dedup queries is 20s vs 3s.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => }
    }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => }
      }
      spark.catalog.clearCache()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => System.err.println(s"[bench] $name FAILED: $e")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.err.println(f"[bench] $name%-28s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val wcRate = streamingWordcount(spark)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""streaming_wordcount_rows_per_s":$wcRate,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Streaming micro-bench mirroring the reference's wordcount harness
    * shape (reference: integration_tests/wordcount/base.py): MemoryStream
    * of lines → split → groupBy word count, update mode; reports input
    * rows/s end-to-end. */
  private def streamingWordcount(spark: SparkSession, rows: Int = 200000): Double = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val counts = in.toDF().select(explode(split(col("value"), " ")).as("word"))
      .groupBy("word").count()
    val q = counts.writeStream.format("memory").queryName("graft_wc")
      .outputMode("complete").start()
    val words = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    val batch = (0 until rows).map(i =>
      s"${words(i % 8)} ${words((i / 8) % 8)} ${words((i / 64) % 8)}")
    val t0 = System.nanoTime()
    try {
      in.addData(batch)
      q.processAllAvailable()
      rows / ((System.nanoTime() - t0) / 1e9)
    } finally q.stop()
  }
}
