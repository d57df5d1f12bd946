package graft

import org.apache.spark.sql.functions._
import graft.core.Table
import graft.monitoring.Monitor

/** Monitoring listeners + error-split (reference: internals/monitoring.py,
  * internals/errors.py). */
class MonitorSpec extends SparkSpec {
  import spark.implicits._

  test("splitErrors routes soft-error rows to the side table") {
    val t = Table.fromDF(Seq(("1", 1L), ("x", 2L), ("3", 3L)).toDF("raw", "id"),
      Seq("id"))
      .withColumns("parsed" -> col("raw").try_cast("long"))
    val (ok, bad) = t.splitErrors("parsed")
    assert(rowsOf(ok.df.select("id")) == Set(Seq(1L), Seq(3L)))
    assert(rowsOf(bad.df.select("id")) == Set(Seq(2L)))
  }

  test("batch monitor records completed executions") {
    val buf = Monitor.attachBatch(spark)
    Seq(1, 2, 3).toDF("v").agg(sum("v")).collect()
    // listener bus is async — poll for delivery
    val deadline = System.currentTimeMillis() + 5000
    while (buf.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(!buf.isEmpty)
    assert(Monitor.summary(buf).nonEmpty)
  }

  test("streaming monitor observes micro-batch progress") {
    implicit val sqlCtx = spark.sqlContext
    val buf = Monitor.attachStreaming(spark)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = in.toDF().groupBy("value").count()
      .writeStream.format("memory").queryName("mon_out")
      .outputMode("complete").start()
    try {
      in.addData(1, 2, 2)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 5000
      while (buf.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(!buf.isEmpty)
    } finally q.stop()
  }

  test("metrics HTTP endpoint serves healthz and live buffers as JSON") {
    val batch = Monitor.attachBatch(spark)
    val streams = new java.util.concurrent.ConcurrentLinkedQueue[Monitor.StreamMetric]()
    streams.add(Monitor.StreamMetric("wc", 3L, 42L, 1234.5))
    val srv = Monitor.serve(batch, streams)
    try {
      val port = srv.getAddress.getPort
      def get(path: String): String = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        try {
          assert(conn.getResponseCode == 200)
          new String(conn.getInputStream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
        } finally conn.disconnect()
      }
      assert(get("/healthz").contains("\"ok\""))
      // generate a batch metric, then the endpoint must reflect it live
      Seq(1, 2, 3).toDF("v").agg(sum("v")).collect()
      val deadline = System.currentTimeMillis() + 5000
      while (batch.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val body = get("/metrics")
      assert(body.contains("\"batch\":[") && body.contains("\"duration_ms\""))
      assert(body.contains("\"query\":\"wc\"") && body.contains("\"input_rows\":42"))
    } finally srv.stop(0)
  }

  test("renderDashboard shows batch history and latest stream progress") {
    val batch = new java.util.concurrent.ConcurrentLinkedQueue[Monitor.BatchMetric]()
    batch.add(Monitor.BatchMetric("q1_agg", 12345678L, None))
    batch.add(Monitor.BatchMetric("broken", 0L, Some("boom")))
    val streams = new java.util.concurrent.ConcurrentLinkedQueue[Monitor.StreamMetric]()
    streams.add(Monitor.StreamMetric("wc", 3L, 42L, 1234.5))
    streams.add(Monitor.StreamMetric("wc", 4L, 77L, 2000.0)) // newer wins
    val txt = Monitor.renderDashboard(batch, streams)
    assert(txt.contains("2 batch executions") && txt.contains("1 live streams"))
    assert(txt.contains("q1_agg") && txt.contains("ok"))
    assert(txt.contains("boom"))
    // stream line is the LATEST batch per query, not the history
    assert(txt.contains("77") && !txt.contains("42"))
  }

  test("dashboard aggregates batch executions per operator with a latency histogram") {
    val batch = new java.util.concurrent.ConcurrentLinkedQueue[Monitor.BatchMetric]()
    // 3 runs of one operator across decades: 0.5ms, 5ms, 5ms, plus 2s
    Seq(500000L, 5000000L, 5000000L, 2000000000L).foreach { ns =>
      batch.add(Monitor.BatchMetric("q_mixed", ns, None))
    }
    batch.add(Monitor.BatchMetric("q_other", 1500000L, None))
    val streams = new java.util.concurrent.ConcurrentLinkedQueue[Monitor.StreamMetric]()
    val txt = Monitor.renderDashboard(batch, streams)
    // ONE row per operator (aggregated), not one per execution
    assert(txt.linesIterator.count(_.startsWith("q_mixed")) == 1)
    val row = txt.linesIterator.find(_.startsWith("q_mixed")).get
    assert(row.contains("   4 ")) // run count
    assert(row.contains("0.5") && row.contains("5.0") && row.contains("2000.0"))
    // histogram: <1ms has 1 hit, <10ms has 2 (the densest -> full block),
    // <1s..<10s has the 2s run; decades 3 and 6 empty
    assert(row.contains("[▄█  ▄ ]"))
  }

  test("latencyHistogram buckets by decade and scales to the densest bucket") {
    assert(Monitor.latencyHistogram(Nil) == "      ")
    assert(Monitor.latencyHistogram(Seq(0.5, 5.0, 5.0, 2000.0)) == "▄█  ▄ ")
    // ≥10s lands in the overflow bucket
    assert(Monitor.latencyHistogram(Seq(50000.0)) == "     █")
  }
}
