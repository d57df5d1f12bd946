package graft
import org.apache.spark.sql.SparkSession
import graft.core.Caches

/** Per-stage profiling helper: runs named queries twice (cold/warm cache)
  * with a stage listener printing wall, task-time, GC, CPU and I/O per
  * stage over 300 ms. Usage: tools/run.sh graft.Profile <sfDir> <queries…> */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_dedup_minhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC") // match Verify/oracle
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for (a <- si.submissionTime; b <- si.completionTime) yield b - a
        val m = si.taskMetrics
        if (ms.exists(_ > 300))
          println(f"    [stage ${si.stageId}%4d ${ms.get / 1e3}%7.2f s tasks=${si.numTasks}%4d " +
            f"run=${m.executorRunTime / 1e3}%6.1f gc=${m.jvmGCTime / 1e3}%5.1f " +
            f"deser=${m.executorDeserializeTime / 1e3}%5.1f cpu=${m.executorCpuTime / 1e9}%6.1f " +
            f"in=${m.inputMetrics.recordsRead}%8d sh=${m.shuffleReadMetrics.recordsRead}%8d] " +
            si.details.linesIterator.take(3).mkString(" | ").take(160))
        // deep-dive mode: full graft-frame stack for the expensive stages
        if (sys.env.contains("PROFILE_DEEP") && ms.exists(_ > 5000))
          println(si.details.linesIterator
            .filter(l => l.contains("graft.")).take(12).mkString("\n"))
      }
    })
    for (pass <- 1 to 2; n <- names) {
      t(s"pass$pass $n") {
        println("  rows = " + SparkEntry.queries(n)(spark, sfDir).count())
      }
      spark.catalog.clearCache(); Caches.drain()
    }
    spark.stop()
  }
}
