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

  test("windowJoinSliding joins once per coinciding window (_window_join.py:156)") {
    // duration 60s, hop 30s: each row is in 2 windows
    val left = Seq((1L, "k", ts("2024-01-01 00:00:40"))).toDF("lid", "k", "lt")
    val right = Seq((10L, "k", ts("2024-01-01 00:00:50")),
      (11L, "k", ts("2024-01-01 00:01:10"))).toDF("rid", "k", "rt")
    val out = Temporal.windowJoinSliding(left, right, col("lt"), col("rt"),
      60, 30, Seq("k"))
    // lid=1 windows: [00:00:00,00:01:00) [00:00:30,00:01:30)
    // rid=10 windows: same two -> 2 pair rows; rid=11: [00:00:30),[00:01:00) -> shares 00:00:30 window
    assert(rowsOf(out.select("lid", "rid", "window_start")).map(_.take(2))
      .groupBy(identity).view.mapValues(_ => 1).toMap.keySet ==
      Set(Seq(1L, 10L), Seq(1L, 11L)))
    assert(out.count() == 3)
    // left mode: a row with no coinciding right rows still surfaces per window
    val lonely = Seq((2L, "z", ts("2024-01-01 09:00:00"))).toDF("lid", "k", "lt")
    val outer = Temporal.windowJoinSliding(lonely, right, col("lt"), col("rt"),
      60, 30, Seq("k"), "left")
    assert(outer.count() == 2 && outer.filter(col("rid").isNull).count() == 2)
  }

  test("windowJoinSession forms sessions over the UNION of both sides (_window_join.py:156)") {
    // gap 60s: left 00:00, right 00:30, left 01:00 — each side alone
    // would split, the merged stream chains into ONE session
    val left = Seq((1L, "k", ts("2024-01-01 00:00:00")),
      (2L, "k", ts("2024-01-01 00:01:00"))).toDF("lid", "k", "lt")
    val right = Seq((10L, "k", ts("2024-01-01 00:00:30"))).toDF("rid", "k", "rt")
    val out = Temporal.windowJoinSession(left, right, col("lt"), col("rt"),
      60, Seq("k"))
    assert(rowsOf(out.select("lid", "rid")) == Set(Seq(1L, 10L), Seq(2L, 10L)))
    assert(rowsOf(out.select("session_start")).head ==
      Seq(ts("2024-01-01 00:00:00")))
    // far-apart rows stay in separate sessions -> inner join drops them
    val farRight = Seq((20L, "k", ts("2024-01-01 06:00:00"))).toDF("rid", "k", "rt")
    assert(Temporal.windowJoinSession(left, farRight, col("lt"), col("rt"),
      60, Seq("k")).count() == 0)
  }
}
