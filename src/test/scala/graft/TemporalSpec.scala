package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Temporal operators (reference: stdlib/temporal). Doctest-style small
  * cases, including the edge semantics SURVEY §7.4 flags: inclusive
  * interval bounds on both ends, as-of inclusive equal-timestamp match,
  * nearest tie → backward, sliding hop>duration drops rows. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("tumble assigns origin-aligned fixed windows") {
    val df = Seq(ts("2024-01-01 00:00:59"), ts("2024-01-01 00:01:00"))
      .toDF("t").withColumn("w", Temporal.tumble(col("t"), 60))
    assert(rowsOf(df.select("w")) ==
      Set(Seq(ts("2024-01-01 00:00:00")), Seq(ts("2024-01-01 00:01:00"))))
  }

  test("slideStarts covers the row with every overlapping window") {
    val df = Seq(ts("2024-01-01 00:02:30")).toDF("t")
      .select(Temporal.slideStarts(col("t"), 120, 60).as("ss"))
    val starts = df.as[Seq[Long]].head().map(_ / 1000000)
    // 00:02:30 is covered by windows starting 00:02:00 and 00:01:00
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    assert(starts.toSet == Set(base + 120L, base + 60L))
  }

  test("sliding hop > duration can drop rows (_window.py:322-327)") {
    val df = Seq(ts("2024-01-01 00:00:45")).toDF("t")
      .select(Temporal.slideStarts(col("t"), 30, 60).as("ss"))
    assert(df.as[Seq[Long]].head().isEmpty) // 0:45 not in [0:00,0:30) nor [1:00,1:30)
  }

  test("sessionize groups rows within the gap") {
    val df = Seq(
      ("u", ts("2024-01-01 00:00:00")), ("u", ts("2024-01-01 00:00:30")),
      ("u", ts("2024-01-01 00:10:00")), ("v", ts("2024-01-01 00:00:10")))
      .toDF("u", "t")
    val out = Temporal.sessionize(df, col("t"), 60, Seq(col("u")))
      .groupBy("u", "session_start").count()
    assert(rowsOf(out) == Set(
      Seq("u", ts("2024-01-01 00:00:00"), 2L),
      Seq("u", ts("2024-01-01 00:10:00"), 1L),
      Seq("v", ts("2024-01-01 00:00:10"), 1L)))
  }

  test("sessionizeBy merges while the predicate holds") {
    val df = Seq(("u", ts("2024-01-01 00:00:00")), ("u", ts("2024-01-01 00:00:45")),
      ("u", ts("2024-01-01 00:03:00"))).toDF("u", "t")
    val out = Temporal.sessionizeBy(df, col("t"), Seq(col("u")),
      (prev, cur) => unix_micros(cur) - unix_micros(prev) <= 60L * 1000000L)
    assert(out.select("session_start").distinct().count() == 2)
  }

  test("intervalJoin bounds are inclusive on BOTH ends (_interval_join.py:640)") {
    val left = Seq((1L, ts("2024-01-01 00:01:00"))).toDF("lid", "lt")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:58")), // Δ=-2 → in (lb=-2 inclusive)
      (11L, ts("2024-01-01 00:01:01")), // Δ=+1 → in (ub=+1 inclusive)
      (12L, ts("2024-01-01 00:00:57")), // Δ=-3 → out
      (13L, ts("2024-01-01 00:01:02"))) // Δ=+2 → out
      .toDF("rid", "rt")
    val out = Temporal.intervalJoin(left, right, col("lt"), col("rt"), -2, 1)
    assert(rowsOf(out.select("rid")) == Set(Seq(10L), Seq(11L)))
  }

  test("intervalJoin left keeps unmatched left rows once") {
    val left = Seq((1L, ts("2024-01-01 00:01:00")), (2L, ts("2024-01-01 09:00:00")))
      .toDF("lid", "lt")
    val right = Seq((10L, ts("2024-01-01 00:01:01"))).toDF("rid", "rt")
    val out = Temporal.intervalJoin(left, right, col("lt"), col("rt"), -2, 2,
      how = "left", leftIdCols = Seq("lid"))
    assert(rowsOf(out.select("lid", "rid")) == Set(Seq(1L, 10L), Seq(2L, null)))
  }

  test("asofJoin backward matches latest right at-or-before, inclusive") {
    val left = Seq((1L, "k", ts("2024-01-01 00:01:00"))).toDF("lid", "k", "lt")
    val right = Seq(
      (10L, "k", ts("2024-01-01 00:00:30")),
      (11L, "k", ts("2024-01-01 00:01:00")), // equal ts → matches (inclusive)
      (12L, "k", ts("2024-01-01 00:02:00"))).toDF("rid", "k", "rt")
    val out = Temporal.asofJoin(left, right, col("lt"), col("rt"), Seq("k"),
      Temporal.Backward, rightTieBreak = col("rid"))
    assert(rowsOf(out.select("lid", "rid")) == Set(Seq(1L, 11L)))
  }

  test("asofJoin forward/nearest directions; nearest tie → backward") {
    val left = Seq((1L, "k", ts("2024-01-01 00:01:00"))).toDF("lid", "k", "lt")
    val right = Seq(
      (10L, "k", ts("2024-01-01 00:00:50")), // 10s before
      (12L, "k", ts("2024-01-01 00:01:10"))) // 10s after — tie
      .toDF("rid", "k", "rt")
    val fwd = Temporal.asofJoin(left, right, col("lt"), col("rt"), Seq("k"),
      Temporal.Forward, rightTieBreak = col("rid"))
    assert(rowsOf(fwd.select("lid", "rid")) == Set(Seq(1L, 12L)))
    val near = Temporal.asofJoin(left, right, col("lt"), col("rt"), Seq("k"),
      Temporal.Nearest, rightTieBreak = col("rid"))
    assert(rowsOf(near.select("lid", "rid")) == Set(Seq(1L, 10L))) // tie → earlier
  }

  test("asofJoin inner drops non-matching; left emits nulls") {
    val left = Seq((1L, "k", ts("2024-01-01 00:00:00"))).toDF("lid", "k", "lt")
    val right = Seq((10L, "k", ts("2024-01-01 00:01:00"))).toDF("rid", "k", "rt")
    val l = Temporal.asofJoin(left, right, col("lt"), col("rt"), Seq("k"),
      Temporal.Backward, "left")
    assert(rowsOf(l.select("lid", "rid")) == Set(Seq(1L, null)))
    val i = Temporal.asofJoin(left, right, col("lt"), col("rt"), Seq("k"),
      Temporal.Backward, "inner")
    assert(i.count() == 0)
  }

  test("windowJoinTumbling joins on coinciding windows") {
    val left = Seq((1L, "k", ts("2024-01-01 00:00:10"))).toDF("lid", "k", "lt")
    val right = Seq((10L, "k", ts("2024-01-01 00:00:50")),
      (11L, "k", ts("2024-01-01 00:01:10"))).toDF("rid", "k", "rt")
    val out = Temporal.windowJoinTumbling(left, right, col("lt"), col("rt"), 60, Seq("k"))
    assert(rowsOf(out.select("lid", "rid")) == Set(Seq(1L, 10L)))
  }
}
