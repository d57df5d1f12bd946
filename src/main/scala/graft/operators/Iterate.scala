package graft.operators

import org.apache.spark.sql.DataFrame

/** Fixed-point iteration driver (reference: `pw.iterate`
  * internals/common.py:39, IterateOperator internals/operator.py:316,
  * engine `iterate` src/engine/graph.rs:941).
  *
  * The reference runs iteration inside a differential-dataflow nested
  * scope; the idiomatic Spark analog is a driver-side loop over
  * DataFrames (the GraphX/Pregel pattern). Two scale-critical details:
  *
  *  - [[graft.core.Caches.loopState]] each round (localCheckpoint):
  *    without it the lineage doubles every iteration and planning cost
  *    goes exponential; with it each round starts from materialized
  *    partitions. The rationale and the every-N variant live on the
  *    helper.
  *  - convergence via a COUNT of changed rows (one cheap aggregate), not
  *    a DataFrame equality (two exceptAll shuffles).
  */
object Iterate {

  /** Iterate `step` until `changed(prev, next)` reports 0 changed rows or
    * `maxIter` is hit (reference iteration_limit). `checkEvery` spaces the
    * convergence probe: each probe is an extra Spark job, and for
    * fast-converging algorithms (pointer jumping) probing every other
    * round halves the job count at the cost of ≤ checkEvery-1 extra
    * (idempotent) rounds. */
  def fixpoint(
      init: DataFrame,
      maxIter: Int,
      changed: (DataFrame, DataFrame) => Long,
      checkEvery: Int = 1)(
      step: DataFrame => DataFrame): DataFrame = {
    var cur = graft.core.Caches.loopState(init)
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = graft.core.Caches.loopState(step(cur))
      if ((i + 1) % checkEvery == 0 || i + 1 == maxIter)
        done = changed(cur, next) == 0L
      cur = next
      i += 1
    }
    cur
  }

  /** Multiset-equality convergence — the reference's default (`iterate`
    * stops when the table stops changing). Costs two exceptAll shuffles
    * per round; prefer [[fixpoint]] with a custom `changed` when the
    * algorithm exposes a cheaper delta (e.g. count of updated labels). */
  def fixpointByEquality(init: DataFrame, maxIter: Int)(
      step: DataFrame => DataFrame): DataFrame =
    fixpoint(init, maxIter,
      (prev, next) => next.exceptAll(prev).count() + prev.exceptAll(next).count())(step)

  /** Fixed number of iterations (for numeric algorithms whose floats
    * never become exactly equal, e.g. pagerank). */
  def iterateFixed(init: DataFrame, n: Int)(step: DataFrame => DataFrame): DataFrame = {
    var cur = graft.core.Caches.loopState(init)
    var i = 0
    while (i < n) { cur = graft.core.Caches.loopState(step(cur)); i += 1 }
    cur
  }
}
