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
}
