package graft.monitoring

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Monitoring surface (reference: internals/monitoring.py dashboard +
  * engine http_server.rs probes; operator probes graph.rs:988-995).
  *
  * Spark already exports everything the reference's probes measure (rows
  * per operator, latency) through its listener bus + UI/metrics system;
  * these helpers give the reference-shaped "attach a monitor, read
  * progress" API on top.
  */
object Monitor {

  final case class BatchMetric(name: String, durationNs: Long, error: Option[String])
  final case class StreamMetric(queryName: String, batchId: Long,
      inputRows: Long, processedRowsPerSecond: Double)

  /** Attach a batch query-execution monitor; returns the (live) buffer of
    * completed executions. */
  def attachBatch(spark: SparkSession): ConcurrentLinkedQueue[BatchMetric] = {
    val buf = new ConcurrentLinkedQueue[BatchMetric]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        buf.add(BatchMetric(funcName, durationNs, None))
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
        buf.add(BatchMetric(funcName, 0L, Some(e.toString)))
    })
    buf
  }

  /** Attach a streaming progress monitor (reference: monitoring dashboard
    * rows/s + latency per connector). */
  def attachStreaming(spark: SparkSession): ConcurrentLinkedQueue[StreamMetric] = {
    val buf = new ConcurrentLinkedQueue[StreamMetric]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        buf.add(StreamMetric(
          Option(e.progress.name).getOrElse(e.progress.id.toString),
          e.progress.batchId, e.progress.numInputRows,
          e.progress.processedRowsPerSecond))
    })
    buf
  }

  def summary(buf: ConcurrentLinkedQueue[BatchMetric]): String =
    buf.asScala.map(m => f"${m.name}%-20s ${m.durationNs / 1e6}%10.1f ms ${m.error.getOrElse("")}")
      .mkString("\n")

  /** Log-scale latency histogram over fixed decade buckets
    * (<1 ms, <10 ms, <100 ms, <1 s, <10 s, ≥10 s), bar heights scaled
    * to the densest bucket with eighth-block glyphs — six characters
    * summarizing an operator's whole latency distribution, the
    * per-operator texture of the reference's terminal view
    * (internals/monitoring.py StatisticsMonitor latency column). Fixed
    * edges, not data-derived quantiles, so two refreshes (or two
    * operators) stay visually comparable. */
  private[graft] def latencyHistogram(ms: Seq[Double]): String = {
    val edges = Seq(1.0, 10.0, 100.0, 1000.0, 10000.0)
    val counts = Array.fill(edges.length + 1)(0)
    ms.foreach { v =>
      val i = edges.indexWhere(v < _)
      counts(if (i == -1) edges.length else i) += 1
    }
    val blocks = " ▁▂▃▄▅▆▇█"
    val mx = math.max(counts.max, 1)
    counts.map(c => blocks(if (c == 0) 0 else 1 + (c * 7) / mx)).mkString
  }

  /** Text dashboard over the live buffers — the analog of the
    * reference's terminal monitoring view (internals/monitoring.py
    * StatisticsMonitor: per-connector message counts + operator latency
    * table, redrawn per refresh). Render-on-call from the same
    * concurrent buffers [[serve]] exposes as JSON; loop
    * `print("[2J" + renderDashboard(...))` for the live-refresh
    * experience, or snapshot it into logs. Streams show their LATEST
    * progress per query (the reference shows current-minibatch figures);
    * batch executions aggregate per operator name with run counts,
    * min/p50/max latency and a [[latencyHistogram]]. */
  def renderDashboard(batch: ConcurrentLinkedQueue[BatchMetric],
      streams: ConcurrentLinkedQueue[StreamMetric]): String = {
    val b = batch.asScala.toSeq
    val latest = streams.asScala.toSeq.groupBy(_.queryName)
      .map { case (_, ms) => ms.maxBy(_.batchId) }.toSeq.sortBy(_.queryName)
    val sb = new StringBuilder
    sb ++= s"graft monitor — ${b.size} batch executions, ${latest.size} live streams\n"
    // batch executions aggregate PER OPERATOR NAME (the reference's
    // StatisticsMonitor renders one row per operator): run count,
    // min/median/max latency, a log-decade latency histogram over every
    // completed run, latest error (if any) as the status
    sb ++= f"${"BATCH"}%-32s ${"n"}%4s ${"min ms"}%9s ${"p50 ms"}%9s ${"max ms"}%9s 1ms..10s status\n"
    b.groupBy(_.name).toSeq.sortBy(_._1).foreach { case (name, ms) =>
      val ok = ms.filter(_.error.isEmpty).map(_.durationNs / 1e6).sorted
      val err = ms.flatMap(_.error).lastOption
      val (mn, p50, mx) =
        if (ok.isEmpty) (0.0, 0.0, 0.0)
        else (ok.head, ok((ok.size - 1) / 2), ok.last)
      sb ++= f"${name.take(32)}%-32s ${ms.size}%4d $mn%9.1f $p50%9.1f $mx%9.1f " +
        s"[${latencyHistogram(ok)}] ${err.getOrElse("ok")}\n"
    }
    sb ++= f"${"STREAM"}%-24s ${"batch"}%6s ${"rows"}%10s ${"rows/s"}%12s\n"
    latest.foreach { m =>
      sb ++= f"${m.queryName.take(24)}%-24s ${m.batchId}%6d ${m.inputRows}%10d ${m.processedRowsPerSecond}%12.1f\n"
    }
    sb.result()
  }

  /** Minimal metrics HTTP endpoint (reference: engine
    * src/engine/http_server.rs — the engine serves liveness and
    * per-operator probe values over HTTP; internals/monitoring.py renders
    * the same numbers as the dashboard). JDK-builtin
    * com.sun.net.httpserver, zero dependencies; serves the live listener
    * buffers as JSON:
    *
    *   GET /healthz → {"status":"ok"}
    *   GET /metrics → {"batch":[{name,duration_ms,error}...],
    *                   "streams":[{query,batch_id,input_rows,rows_per_s}...]}
    *
    * `port = 0` binds an ephemeral port — read it from
    * `serve(...).getAddress.getPort`; call `.stop(0)` to release. The
    * handler renders on request from the concurrent buffers, so it
    * observes metrics recorded after it started. */
  def serve(batch: ConcurrentLinkedQueue[BatchMetric],
      streams: ConcurrentLinkedQueue[StreamMetric],
      port: Int = 0): com.sun.net.httpserver.HttpServer = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val srv = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    // full JSON string escaping: error messages routinely carry newlines
    // (multi-line AnalysisException plans) — a bare control char would
    // make the whole /metrics payload unparsable exactly when a failure
    // needs reporting
    def esc(s: String): String = {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.toString
    }
    def num(d: Double) = if (d.isNaN || d.isInfinite) "0.0" else d.toString
    def respond(ex: HttpExchange, body: String): Unit = {
      val b = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
    }
    srv.createContext("/healthz",
      (ex: HttpExchange) => respond(ex, """{"status":"ok"}"""))
    srv.createContext("/metrics", (ex: HttpExchange) => {
      val bj = batch.asScala.map(m =>
        s"""{"name":"${esc(m.name)}","duration_ms":${num(m.durationNs / 1e6)},""" +
        s""""error":${m.error.map(e => "\"" + esc(e) + "\"").getOrElse("null")}}""")
        .mkString("[", ",", "]")
      val sj = streams.asScala.map(m =>
        s"""{"query":"${esc(m.queryName)}","batch_id":${m.batchId},""" +
        s""""input_rows":${m.inputRows},"rows_per_s":${num(m.processedRowsPerSecond)}}""")
        .mkString("[", ",", "]")
      respond(ex, s"""{"batch":$bj,"streams":$sj}""")
    })
    srv.start()
    srv
  }
}
