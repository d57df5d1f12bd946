package graft.core

import org.apache.spark.sql.DataFrame

/** Input-parallelism widening for CPU-dominant operator stages.
  *
  * Shingling and pairwise vector scoring inherit the INPUT's
  * partitioning (their expansion happens before any shuffle, or flows
  * through broadcast joins), so a corpus that arrives as one small
  * parquet split would run those loops single-threaded no matter how
  * many cores the session has. The fix is a repartition-up-front while
  * rows are still cheap to move — but only when the input is actually
  * narrow.
  *
  * The previous narrowness probe, `df.rdd.getNumPartitions`, answered
  * exactly that question at the cost of materializing the physical RDD
  * DAG on every call (a full physical-planning pass Catalyst then cannot
  * re-plan under AQE, plus driver time on wide pipelines). This version
  * estimates the same thing from the OPTIMIZED LOGICAL plan's size
  * statistics: file sources split input at
  * `spark.sql.files.maxPartitionBytes`, so
  * estimated input partitions ≈ ceil(sizeInBytes / maxPartitionBytes) —
  * no physical planning, no RDD, AQE untouched.
  */
object Par {

  /** Repartition `df` to the session's shuffle parallelism if the
    * plan-stat estimate says it arrives narrower. On a warehouse-scale
    * input (stats ≫ partitions × maxPartitionBytes) this is a no-op; on
    * a single small split it restores full parallelism — identical
    * decisions to the old physical probe at both extremes, which is
    * where it matters. */
  def spread(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val par = conf.numShufflePartitions
    val maxBytes = math.max(1L, conf.filesMaxPartitionBytes)
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // plans without real statistics (LogicalRDD, post-shuffle frames,
    // join products) report the `spark.sql.defaultSizeInBytes` sentinel
    // or an inflated product ≥ it — treating that as "wide" would
    // silently serialize exactly the fan-out stages spread exists to
    // parallelize. Only there, pay for the physical probe; file-sourced
    // frames (the common callers) keep the stats-only fast path.
    val estParts =
      if (size >= BigInt(conf.defaultSizeInBytes)) BigInt(df.rdd.getNumPartitions)
      else size / maxBytes
    if (estParts < par) df.repartition(par) else df
  }
}
