package graft

import org.apache.spark.sql.functions._
import graft.agg.reducers

/** Reducer semantics (reference: internals/reducers.py + reduce.rs),
  * including the §7.4 risk cases: unique errors on >1 distinct value. */
class ReducersSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 3L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0), ("b", 7L, 4.0))
    .toDF("g", "v", "x")

  test("argmin/argmax return id of extremal row") {
    val out = df.groupBy("g").agg(
      reducers.argmin(col("x"), col("v")).as("amin"),
      reducers.argmax(col("x"), col("v")).as("amax"))
    assert(rowsOf(out) == Set(Seq("a", 2.0, 1.0), Seq("b", 4.0, 4.0)))
  }

  test("unique returns the single value; errors on >1 (reducers.py:426)") {
    val ok = Seq(("a", 1L), ("a", 1L)).toDF("g", "v")
      .groupBy("g").agg(reducers.runique(col("v")).as("u"))
    assert(rowsOf(ok) == Set(Seq("a", 1L)))
    val bad = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
      .groupBy("g").agg(reducers.runique(col("v")).as("u"))
    intercept[Exception] { bad.collect() }
  }

  test("sorted_tuple and tuple_by gather in order") {
    val out = df.groupBy("g").agg(
      reducers.sorted_tuple(col("v")).as("st"),
      reducers.tuple_by(col("x"), col("v")).as("tb"))
    assert(rowsOf(out) == Set(
      Seq("a", Seq(1L, 2L, 3L), Seq(2.0, 3.0, 1.0)),
      Seq("b", Seq(7L), Seq(4.0))))
  }

  test("earliest/latest pick by event time (reducers.py:653/:687)") {
    val e = Seq(("u", ts("2024-01-01 00:00:00"), "first"),
      ("u", ts("2024-01-01 12:00:00"), "last")).toDF("u", "t", "v")
    val out = e.groupBy("u").agg(
      reducers.earliest(col("v"), col("t")).as("e"),
      reducers.latest(col("v"), col("t")).as("l"))
    assert(rowsOf(out) == Set(Seq("u", "first", "last")))
  }

  test("arraySumFloat Aggregator sums element-wise") {
    val out = Seq(("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 4.0f)))
      .toDF("g", "vec")
      .groupBy("g")
      .agg(udaf(reducers.arraySumFloat).apply(col("vec")).as("s"))
    assert(rowsOf(out) == Set(Seq("a", Seq(4.0, 6.0))))
  }

  test("array_sum_fixed declarative variant") {
    val out = Seq(("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)))
      .toDF("g", "vec")
      .groupBy("g").agg(reducers.array_sum_fixed(col("vec"), 2).as("s"))
    assert(rowsOf(out) == Set(Seq("a", Seq(4.0, 6.0))))
  }

  test("retraction-aware reducers fold diffs; netRows feeds non-invertible") {
    // diff stream: insert 10, 20, 30 into group a; retract the 20;
    // group b inserts 5 twice and retracts one of them
    val diffs = Seq(
      ("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 1L), ("a", 20L, -1L),
      ("b", 5L, 1L), ("b", 5L, 1L), ("b", 5L, -1L))
      .toDF("g", "v", "diff")
    val inv = diffs.groupBy("g").agg(
      reducers.retractSum(col("v"), col("diff")).as("s"),
      reducers.retractCount(col("diff")).as("n"),
      reducers.retractAvg(col("v"), col("diff")).as("m"))
    // equals the batch recompute over surviving rows: a = {10, 30}, b = {5}
    assert(rowsOf(inv) == Set(Seq("a", 40L, 2L, 20.0), Seq("b", 5L, 1L, 5.0)))
    // non-invertible path: net surviving row images, then a plain min/max
    val net = reducers.netRows(diffs, "diff")
    assert(rowsOf(net) == Set(Seq("a", 10L), Seq("a", 30L), Seq("b", 5L)))
    val mm = net.groupBy("g").agg(min("v").as("lo"), max("v").as("hi"))
    assert(rowsOf(mm) == Set(Seq("a", 10L, 30L), Seq("b", 5L, 5L)))
    // net multiplicity > 1 survives the collapse: two live inserts of the
    // same image emit TWO rows (multiset parity for sorted_tuple et al.)
    val dup = Seq(("c", 7L, 1L), ("c", 7L, 1L), ("c", 7L, 1L), ("c", 7L, -1L))
      .toDF("g", "v", "diff")
    assert(reducers.netRows(dup, "diff").count() == 2)
  }

  test("sorted_tuple keeps NULLs sorted FIRST when skipNones = false") {
    // reference Value Ord puts None first (value.rs:207)
    val df = Seq(("a", Some(2L)), ("a", Option.empty[Long]), ("a", Some(1L)))
      .toDF("g", "v")
    val kept = df.groupBy("g")
      .agg(reducers.sorted_tuple(col("v"), skipNones = false).as("t"))
      .select("t").collect()(0).getSeq[Any](0)
    assert(kept == Seq(null, 1L, 2L))
    val skipped = df.groupBy("g")
      .agg(reducers.sorted_tuple(col("v")).as("t"))
      .select("t").collect()(0).getSeq[Any](0)
    assert(skipped == Seq(1L, 2L))
  }

  test("rpercentile interpolates continuously; rmedian = p50") {
    // values 10,20,30,40: p50 = 25 (midpoint), p25 = 17.5, p1=0 bound ok
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0))
      .toDF("g", "v")
    val r = df.groupBy("g").agg(
      reducers.rmedian(col("v")).as("med"),
      reducers.rpercentile(col("v"), 0.25).as("p25"),
      reducers.rpercentile(col("v"), 1.0).as("p100"))
      .collect()(0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getDouble(2) == 17.5)
    assert(r.getDouble(3) == 40.0)
    intercept[IllegalArgumentException] {
      reducers.rpercentile(col("v"), 1.5)
    }
  }

  test("exact-sum moments match the closed forms; n<2 gives NULL") {
    // 1,2,3,4: var_samp = 5/3, sd = sqrt(5/3); y = 2x → corr 1, covar 10/3
    val d = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      ("a", 4.0, 8.0), ("b", 5.0, 1.0)).toDF("g", "x", "y")
    val r = d.groupBy("g").agg(
      reducers.rvarSamp(col("x")).as("v"),
      reducers.rstddevSamp(col("x")).as("sd"),
      reducers.rcovarSamp(col("x"), col("y")).as("cv"),
      reducers.rcorr(col("x"), col("y")).as("cr"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(r("a").getDouble(1) - 5.0 / 3) < 1e-12)
    assert(math.abs(r("a").getDouble(2) - math.sqrt(5.0 / 3)) < 1e-12)
    assert(math.abs(r("a").getDouble(3) - 10.0 / 3) < 1e-12)
    assert(math.abs(r("a").getDouble(4) - 1.0) < 1e-12)
    assert(r("b").isNullAt(1) && r("b").isNullAt(3)) // n < 2
    assert(r("b").isNullAt(4)) // corr undefined at zero variance
  }

  test("modeOfCounted picks most frequent, smallest value on ties") {
    val d = Seq(("a", 5L), ("a", 5L), ("a", 1L), ("a", 9L), ("a", 9L),
      ("b", 2L)).toDF("g", "v")
    val counted = d.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val m = counted.groupBy("g")
      .agg(reducers.modeOfCounted(col("v"), col("cnt")).as("m"))
    // 5 and 9 both appear twice in group a — smallest (5) wins
    assert(rowsOf(m) == Set(Seq("a", 5L), Seq("b", 2L)))
  }
}
