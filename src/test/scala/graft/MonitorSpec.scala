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
}
