package graft

import org.apache.spark.sql.functions._
import graft.plans.AggExprs

/** [[graft.plans.MinHex32Agg]] — the hash-aggregable min over md5 hex.
  * The contract is BIT-identity with built-in `min(STRING)` on 32-char
  * lowercase hex (so every dedup oracle downstream of
  * [[graft.operators.Dedup.minhash]] is unaffected) plus the plan
  * property the aggregate exists for: HashAggregate, never
  * SortAggregate. */
class AggExprsSpec extends SparkSpec {
  import spark.implicits._

  test("minHex32 == min(string) on md5 hex, randomized groups") {
    // deterministic pseudo-random corpus: md5 of a counter, grouped mod 7
    val df = spark.range(2000)
      .select((col("id") % 7).as("g"), md5(col("id").cast("string")).as("h"))
    val got = df.groupBy("g").agg(AggExprs.minHex32(col("h")).as("m"))
    val want = df.groupBy("g").agg(min(col("h")).as("m"))
    assert(rowsOf(got) == rowsOf(want))
  }

  test("minHex32 boundary digests: all-zero / all-f / high-bit halves") {
    // covers the sign-bias edges: 0x00..0, 0xff..f, and values whose
    // hi/lo halves straddle the long sign bit
    val hs = Seq(
      "00000000000000000000000000000000",
      "ffffffffffffffffffffffffffffffff",
      "7fffffffffffffffffffffffffffffff",
      "80000000000000000000000000000000",
      "00000000000000007fffffffffffffff",
      "00000000000000008000000000000000",
      "8000000000000000ffffffffffffffff")
    val df = hs.zipWithIndex.map { case (h, i) => (i % 2, h) }.toDF("g", "h")
    val got = df.groupBy("g").agg(AggExprs.minHex32(col("h")).as("m"))
    val want = df.groupBy("g").agg(min(col("h")).as("m"))
    assert(rowsOf(got) == rowsOf(want))
  }

  test("minHex32 ignores NULLs; all-NULL group yields NULL (Min contract)") {
    val df = Seq((0, Option("0000000000000000000000000000000a")),
      (0, None), (1, None), (1, None)).toDF("g", "h")
    val got = df.groupBy("g").agg(AggExprs.minHex32(col("h")).as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(got(0).contains("0000000000000000000000000000000a"))
    assert(got(1).isEmpty)
  }

  test("minHex32 plans HashAggregate, not SortAggregate") {
    val df = spark.range(100)
      .select((col("id") % 3).as("g"), md5(col("id").cast("string")).as("h"))
      .groupBy("g").agg(AggExprs.minHex32(col("h")).as("m"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), s"expected hash aggregation:\n$p")
    assert(!p.contains("SortAggregate"), s"no sort-based aggregation:\n$p")
  }
}
