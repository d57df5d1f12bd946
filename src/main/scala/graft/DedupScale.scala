package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence harness for the incremental-dedup claim that matters at
  * 100 TB: [[graft.operators.Dedup.dedupAgainst]]'s cost must be
  * (near-)independent of the INDEXED HISTORY size — the probe pays one
  * signature-table read and a band equi-join, never a re-shingle or a
  * text scan of history. The BENCH scale runs can't isolate this (their
  * probe grows with sf); here the probe batch is FIXED and only the
  * history grows.
  *
  * Usage: tools/run.sh graft.DedupScale <probeSfDir> <histDir1> [histDir2 …]
  * (env REPS, default 3). For each history dir: builds (or reuses) a
  * signature index over its documents under /tmp/dedup_scale_idx_<name>,
  * then times dedupAgainst(probe = first 2000 docs of <probeSfDir>)
  * min-of-REPS. Prints one line per history size: doc count, index
  * build seconds, probe seconds, matched-pair count (sanity: should
  * scale with history dups of the fixed probe). */
object DedupScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DedupScale <probeSfDir> <histDir…>")
    val probeDir = args(0)
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("LC", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SP", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    // FIXED probe: the same 2000 documents regardless of history size
    val probe = spark.read.parquet(s"$probeDir/documents.parquet")
      .filter(col("doc_id") < 2000).select("doc_id", "text")
    println(f"probe=${probe.count()}%d docs from $probeDir, reps=$reps")
    args.drop(1).foreach { hist =>
      val docs = spark.read.parquet(s"$hist/documents.parquet")
        .select("doc_id", "text")
      val n = docs.count()
      val idx = s"/tmp/dedup_scale_idx_${new java.io.File(hist).getName}"
      val tb0 = System.nanoTime()
      val built =
        if (graft.core.IndexGen.current(idx).isDefined) "reused"
        else {
          graft.operators.Dedup.signatureSave(docs, col("doc_id"),
            col("text"), idx, n = 3, k = 6, bands = 3)
          f"${(System.nanoTime() - tb0) / 1e9}%.1f s"
        }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val pairs = graft.operators.Dedup.dedupAgainst(spark, idx, probe,
          col("doc_id"), col("text"), threshold = 0.5).count()
        val secs = (System.nanoTime() - t0) / 1e9
        // cache teardown OUTSIDE the timed window: the eager-cached
        // probe/signature frames grow with history, so timing their
        // unpersist would contaminate exactly the flatness claim this
        // harness exists to measure
        spark.catalog.clearCache(); graft.core.Caches.drain()
        (secs, pairs)
      }
      println(f"hist=$hist%-22s docs=$n%9d build=$built%-8s " +
        f"probe_min=${times.map(_._1).min}%6.2f s pairs=${times.head._2}%d")
    }
    spark.stop()
  }
}
