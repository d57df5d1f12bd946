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
}
