package graft

import scala.concurrent.Future
import org.apache.spark.sql.functions._

/** UDF wrappers (reference: internals/udfs). */
class UdfsSpec extends SparkSpec {
  import spark.implicits._

  test("udf1 applies and respects determinism flag") {
    val double_ = udfs.udf1[Long, Long](_ * 2)
    val out = Seq(1L, 2L).toDF("v").select(double_(col("v")).as("d"))
    assert(rowsOf(out) == Set(Seq(2L), Seq(4L)))
    assert(!udfs.udf1[Long, Long](_ + 1, deterministic = false).deterministic)
  }

  test("asyncMap preserves order, retries transient failures") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val flaky = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    val ds = spark.range(0, 20).as[Long].map(_.toInt)
    val out = udfs.asyncMap(ds, parallelism = 4, retries = 3) { i =>
      Future {
        // fail the first attempt for even inputs
        val n = flaky.merge(i, 1, (a: Integer, b: Integer) => a + b)
        if (i % 2 == 0 && n == 1) throw new RuntimeException("transient")
        i * 10
      }
    }
    assert(out.collect().toSeq == (0 until 20).map(_ * 10))
  }

  test("cached memoizes per-executor") {
    val calls = new java.util.concurrent.atomic.AtomicInteger()
    val f = udfs.cached[Int, Int]({ a => calls.incrementAndGet(); a + 1 })
    assert(f(1) == 2 && f(1) == 2 && f(2) == 3)
    assert(calls.get() == 2)
  }

  test("memoize persists results across runs; only misses recompute (UdfCaching)") {
    import org.apache.spark.sql.functions._
    val store = java.nio.file.Files.createTempDirectory("graft_memo").toString + "/memo"
    val computed = spark.sparkContext.longAccumulator("computed")
    def expensive(missing: org.apache.spark.sql.DataFrame) =
      missing.select(col("k"),
        udf((k: Long) => { computed.add(1); k * 10 }).apply(col("k")).as("v"))
    val run1 = udfs.memoize(spark, store,
      Seq(1L, 2L, 3L, 2L).toDF("k"), "k")(expensive)
    assert(rowsOf(run1) == Set(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)))
    assert(computed.value == 3) // distinct inputs only
    // second run: 2 hits + 1 new key -> exactly one recompute
    val run2 = udfs.memoize(spark, store,
      Seq(2L, 3L, 4L).toDF("k"), "k")(expensive)
    assert(rowsOf(run2) == Set(Seq(2L, 20L), Seq(3L, 30L), Seq(4L, 40L)))
    assert(computed.value == 4)
    // result is restricted to the requested keys (1L not returned)
    assert(!run2.select("k").collect().map(_.getLong(0)).contains(1L))
  }

  test("memoize serves NULL keys from the store instead of recomputing") {
    import org.apache.spark.sql.functions._
    val store = java.nio.file.Files.createTempDirectory("graft_memo_n").toString + "/memo"
    val computed = spark.sparkContext.longAccumulator("computed_n")
    def expensive(missing: org.apache.spark.sql.DataFrame) =
      missing.select(col("k"),
        udf((k: java.lang.Long) => { computed.add(1); 7L }).apply(col("k")).as("v"))
    val in = Seq(Some(1L), None).toDF("k")
    val run1 = udfs.memoize(spark, store, in, "k")(expensive)
    assert(run1.count() == 2 && computed.value == 2)
    // second run with the same inputs: both keys (incl. NULL) are hits
    val run2 = udfs.memoize(spark, store, in, "k")(expensive)
    assert(run2.count() == 2)
    assert(computed.value == 2) // nothing recomputed
  }

  test("async retries back off exponentially when a base delay is given") {
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val ds = spark.range(0, 1).as[Long].map(_.toInt)
    val t0 = System.nanoTime()
    val out = udfs.asyncMap(ds, parallelism = 1, retries = 2,
        backoff = 40.millis) { i =>
      Future {
        if (System.nanoTime() - t0 < 100L * 1000000L)
          throw new RuntimeException("transient")
        i
      }
    }.collect()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    // two backoffs (40ms + 80ms) must have elapsed before success
    assert(out.toSeq == Seq(0) && elapsedMs >= 100)
  }
}
