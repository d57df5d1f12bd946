package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.reflect.runtime.universe.TypeTag
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** UDF surface (reference: internals/udfs/__init__.py:68 `class UDF` /
  * :290 `udf` — options: deterministic, propagate_none, retries, timeout,
  * caching; executors in internals/udfs/executors.py).
  *
  * Design stance: scalar UDFs should be RARE — the expression namespaces
  * in [[graft.functions]] stay inside codegen and are always preferred.
  * When real black-box logic is unavoidable:
  *  - sync path: `udf1/udf2` — a plain Scala UDF, optionally marked
  *    non-deterministic (blocks pushdown-through-it re-ordering, exactly
  *    like the reference's deterministic=False).
  *  - async path (reference apply_async / AsyncTransformer
  *    stdlib/utils/async_transformer.py:282): [[asyncMap]] —
  *    mapPartitions with a bounded in-flight window of Futures + retry
  *    with backoff. Per-partition parallelism × executor count = cluster
  *    concurrency; no driver bottleneck.
  */
object udfs {

  /** Sync scalar UDF. `propagateNone` is Spark's default null handling
    * for reference types (null in → null out for boxed inputs). */
  def udf1[A: TypeTag, R: TypeTag](f: A => R,
      deterministic: Boolean = true): UserDefinedFunction = {
    val u = udf(f)
    if (deterministic) u else u.asNondeterministic()
  }

  def udf2[A: TypeTag, B: TypeTag, R: TypeTag](f: (A, B) => R,
      deterministic: Boolean = true): UserDefinedFunction = {
    val u = udf(f)
    if (deterministic) u else u.asNondeterministic()
  }

  /** Exponential-backoff retry driver shared by [[asyncMap]] and
    * [[asyncSettle]] (reference: udfs/retries.py ExponentialBackoffRetry
    * — delay doubles per attempt). `backoff = 0` retries immediately —
    * the right setting when the failure is deterministic (a replay of
    * known-bad rows) rather than transient (a rate-limited service).
    * Only non-fatal failures retry; fatal JVM errors propagate. The
    * sleep occupies one of the caller's bounded in-flight slots, which
    * is exactly the throttling a backoff is for. */
  private def retrying[T, R](f: T => Future[R], retries: Int,
      backoff: Duration)(implicit ec: ExecutionContext): T => Future[R] = {
    def attempt(t: T, left: Int): Future[R] =
      f(t).recoverWith {
        case scala.util.control.NonFatal(_) if left > 0 =>
          val delayMs = backoff.toMillis << (retries - left)
          if (delayMs <= 0) attempt(t, left - 1)
          else Future { Thread.sleep(delayMs) }.flatMap(_ => attempt(t, left - 1))
      }
    t => attempt(t, retries)
  }

  /** Async row transform with bounded concurrency and retries
    * (reference: udfs/retries.py exponential backoff; executors.py async
    * executor). `f` runs on executor-side threads; each partition keeps
    * at most `parallelism` calls in flight. */
  def asyncMap[T, R: Encoder](ds: Dataset[T], parallelism: Int = 8,
      retries: Int = 3, timeout: Duration = 30.seconds,
      backoff: Duration = Duration.Zero)(
      f: T => Future[R]): Dataset[R] = {
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      val attempt = retrying(f, retries, backoff)
      // sliding window of in-flight futures: submit `parallelism` ahead,
      // then drain in order (preserves row order, bounds memory)
      new Iterator[R] {
        private val queue = scala.collection.mutable.Queue.empty[Future[R]]
        private val src = it.map(attempt)
        private def fill(): Unit =
          while (queue.size < parallelism && src.hasNext) queue.enqueue(src.next())
        def hasNext: Boolean = { fill(); queue.nonEmpty }
        def next(): R = { fill(); Await.result(queue.dequeue(), timeout) }
      }
    }
  }

  /** Async transform that SETTLES every row: successes emit
    * `(Some(result), None)`, rows still failing after `retries` emit
    * `(None, Some(input))` instead of raising — the non-1:1 relaxation
    * AsyncTransformer needs (a failed invocation must not kill the
    * stream). Same bounded in-flight window as [[asyncMap]]. */
  def asyncSettle[T, R](ds: Dataset[T], parallelism: Int = 8,
      retries: Int = 3, timeout: Duration = 30.seconds,
      backoff: Duration = Duration.Zero)(f: T => Future[R])(
      implicit e: Encoder[(Option[R], Option[T])]): Dataset[(Option[R], Option[T])] =
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      val attempt = retrying(f, retries, backoff)
      new Iterator[(Option[R], Option[T])] {
        private val queue = scala.collection.mutable.Queue.empty[(T, Future[R])]
        private val src = it.map(t => (t, attempt(t)))
        private def fill(): Unit =
          while (queue.size < parallelism && src.hasNext) queue.enqueue(src.next())
        def hasNext: Boolean = { fill(); queue.nonEmpty }
        def next(): (Option[R], Option[T]) = {
          fill()
          val (t, fut) = queue.dequeue()
          Try(Await.result(fut, timeout)) match {
            case Success(r) => (Some(r), None)
            case Failure(_) => (None, Some(t))
          }
        }
      }
    }

  /** AsyncTransformer analog (reference:
    * stdlib/utils/async_transformer.py:282 — async `invoke` per row, a
    * completion table that fills in as invocations finish, failures
    * routed aside instead of raising).
    *
    * Structured-Streaming mapping: foreachBatch drives [[asyncSettle]]
    * over each micro-batch — invocations run on executor-side threads
    * with a bounded in-flight window (parallelism × partitions = cluster
    * concurrency, no driver bottleneck) — and hands the batch's settled
    * successes and failures to `sink` keyed by batch id. Completions are
    * batch-bounded (a micro-batch commits only after its rows settle),
    * which is what makes checkpoint recovery exact: restart re-invokes
    * the uncommitted batch, at-least-once like the reference's
    * `instance` consistency mode. */
  def asyncTransformer[T, R](input: Dataset[T], parallelism: Int = 8,
      retries: Int = 3, timeout: Duration = 30.seconds,
      checkpoint: Option[String] = None)(f: T => Future[R])(
      sink: (Dataset[R], Dataset[T], Long) => Unit)(
      implicit er: Encoder[R], et: Encoder[T],
      ep: Encoder[(Option[R], Option[T])]): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = input.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      val settled = asyncSettle(batch, parallelism, retries, timeout)(f).persist()
      try sink(settled.flatMap(_._1), settled.flatMap(_._2), id)
      finally { settled.unpersist(); () }
    }
    checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }

  /** Persistent UDF memoization (reference: UdfCaching persistence mode,
    * python_api.rs:3698; internals/udfs/caches.py DiskCache): results
    * live in a parquet memo table keyed by the input column; repeated
    * runs of a pipeline skip every already-computed input.
    *
    * JOIN-shaped, never a per-row store lookup:
    *   memo   = read(store)                       (absent → empty)
    *   misses = distinct inputs ANTI JOIN memo    (one shuffle)
    *   fresh  = compute(misses)                   (the expensive part)
    *   store += fresh;  return memo ∪ fresh restricted to inputs
    * `compute` receives a DataFrame of distinct missing keys and must
    * return (key, ...result columns) — it runs distributed, so the
    * expensive function scales with executors while the memo suppresses
    * recomputation across runs. `compute` must be deterministic (same
    * contract as the reference's cached UDFs). Appends are
    * last-writer-wins per file — concurrent writers of DISTINCT keys are
    * safe (parquet append), concurrent writers of the same key would
    * duplicate it; the read side dedups defensively. */
  def memoize(spark: org.apache.spark.sql.SparkSession, store: String,
      inputs: org.apache.spark.sql.DataFrame, key: String)(
      compute: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val keys = inputs.select(key).distinct()
    val memo = Try(spark.read.parquet(store)).toOption
    // null-safe equality throughout: a plain equi-join never matches a
    // NULL key, which would re-compute + re-append the null row every
    // run and silently drop it from the returned slice
    val misses = memo.fold(keys) { m =>
      val mk = m.select(col(key).as("_memo_k")).distinct()
      keys.join(mk, col(key) <=> col("_memo_k"), "left_anti")
    }
    if (!misses.isEmpty)
      compute(misses).write.mode("append").parquet(store)
    spark.read.parquet(store)
      .dropDuplicates(key) // treats NULLs as equal, matching <=>
      .join(keys.select(col(key).as("_req_k")),
        col(key) <=> col("_req_k"), "inner") // only the requested slice
      .drop("_req_k")
  }

  /** Memoizing wrapper for expensive deterministic functions —
    * executor-local LRU (reference: udfs/caches.py; [[memoize]] is the
    * persistent cross-run variant). */
  def cached[A, R](f: A => R, maxEntries: Int = 10000): A => R = {
    val cache = new java.util.LinkedHashMap[A, R](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[A, R]): Boolean =
        size() > maxEntries
    }
    (a: A) => cache.synchronized {
      val hit = cache.get(a)
      if (hit != null || cache.containsKey(a)) hit
      else { val r = f(a); cache.put(a, r); r }
    }
  }
}
