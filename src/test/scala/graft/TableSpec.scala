package graft

import org.apache.spark.sql.functions._
import graft.core.Table

/** Table core ops (reference semantics: internals/table.py — doctest
  * examples are the spec). */
class TableSpec extends SparkSpec {
  import spark.implicits._

  private def people = Table.fromDF(
    Seq((1L, "alice", 25L), (2L, "bob", 32L), (3L, "carol", 28L))
      .toDF("id", "name", "age"), Seq("id"))

  test("select keeps key and projects expressions") {
    val out = people.select("up" -> upper(col("name")), "age2" -> col("age") * 2)
    assert(out.df.columns.toSeq == Seq("id", "up", "age2"))
    assert(rowsOf(out.df) == Set(Seq(1L, "ALICE", 50L), Seq(2L, "BOB", 64L), Seq(3L, "CAROL", 56L)))
  }

  test("select can redefine a key column without duplicating it") {
    val out = people.select("id" -> (col("id") + 10), "name" -> col("name"))
    assert(out.df.columns.toSeq == Seq("id", "name"))
    assert(rowsOf(out.df.select("id")) == Set(Seq(11L), Seq(12L), Seq(13L)))
    // the result stays a usable keyed table (no ambiguous reference)
    assert(out.filter(col("id") === 11L).df.count() == 1)
  }

  test("updateCells overwrites with NULL and raises on duplicate update keys") {
    // presence in `other` is the update signal: a NULL value must land
    val clear = Table.fromDF(
      Seq((1L, Option.empty[String])).toDF("id", "name"), Seq("id"))
    val out = people.updateCells(clear)
    assert(out.df.filter(col("id") === 1L).select("name")
      .collect()(0).isNullAt(0))
    assert(out.df.filter(col("id") === 2L).select("name")
      .collect()(0).getString(0) == "bob") // untouched keys keep values
    // duplicate keys in the update table fan out silently without the
    // guard — reference raises (ReplaceDuplicatesWithError)
    val dup = Table.fromDF(
      Seq((1L, "x"), (1L, "y")).toDF("id", "name"), Seq("id"))
    intercept[Exception] { people.updateCells(dup).df.collect() }
    intercept[Exception] {
      people.updateRows(Table.fromDF(
        Seq((1L, "x", 1L), (1L, "y", 2L)).toDF("id", "name", "age"),
        Seq("id"))).df.collect()
    }
  }

  test("interpolate bridges duplicate timestamps without div-by-zero NULL") {
    val t = Table.fromDF(
      Seq((1L, 100L, Some(1.0)), (2L, 100L, Option.empty[Double]),
        (3L, 100L, Some(3.0))).toDF("id", "t", "v"), Seq("id"))
    val out = t.interpolate(col("t"), Seq(col("id")), None, "v")
    // zero-width bracket: the previous known value fills the gap
    assert(out.df.filter(col("id") === 2L).select("v")
      .collect()(0).getDouble(0) == 1.0)
  }

  test("deduplicateLatest picks a deterministic survivor on order ties") {
    val t = Table.fromDF(
      Seq((1L, 10L, "a"), (1L, 10L, "z"), (2L, 5L, "m")).toDF("id", "t", "v"),
      Seq("id"))
    // same orderBy value for key 1 twice: content tie-break (struct desc)
    // pins the survivor — 'z' > 'a' in the row struct ordering
    (1 to 3).foreach { _ =>
      val out = t.deduplicateLatest(col("t"), Seq("id"))
        .df.filter(col("id") === 1L).select("v").collect()
      assert(out.length == 1 && out(0).getString(0) == "z")
    }
  }

  test("filter and split partition rows") {
    val (old, young) = people.split(col("age") >= 28)
    assert(rowsOf(old.df.select("id")) == Set(Seq(2L), Seq(3L)))
    assert(rowsOf(young.df.select("id")) == Set(Seq(1L)))
  }

  test("concat unions disjoint keys") {
    val (a, b) = people.split(col("age") >= 28)
    assert(a.concat(b).df.count() == 3)
  }

  test("concat raises on duplicate keys (reference: dataflow.rs:895)") {
    val ex = intercept[Exception] { people.concat(people).df.count() }
    assert(ex.getMessage.contains("duplicate key") ||
      ex.getCause != null && ex.getCause.getMessage.contains("duplicate key"))
  }

  test("concatReindex unions under a new key (table.py:308)") {
    val other = Table.fromDF(Seq((1L, "dup", 30)).toDF("id", "name", "age"), Seq("id"))
    // duplicate ids allowed: the union is re-keyed
    val out = people.concatReindex(Seq("name"), other)
    assert(out.key == Seq("name") && out.df.count() == 4)
  }

  test("Table.empty has no rows but carries the schema") {
    val e = graft.core.Table.empty(spark,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    assert(e.df.count() == 0 && e.df.columns.toSeq == Seq("id") && e.key == Seq("id"))
  }

  test("withUniverseOf passes on equal universes, raises on mismatch (universe_solver.py:14)") {
    val same = Table.fromDF(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v"), Seq("id"))
    assert(people.withUniverseOf(same).df.count() == 3)
    val smaller = Table.fromDF(Seq((1L, "x"), (3L, "y")).toDF("id", "v"), Seq("id"))
    val ex = intercept[Exception] { people.withUniverseOf(smaller).df.count() }
    assert(ex.getMessage.contains("universes are not equal") ||
      ex.getCause != null && ex.getCause.getMessage.contains("universes are not equal"))
    val bigger = Table.fromDF(
      Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")).toDF("id", "v"), Seq("id"))
    val ex2 = intercept[Exception] { people.withUniverseOf(bigger).df.count() }
    assert(ex2.getMessage.contains("universes are not equal") ||
      ex2.getCause != null && ex2.getCause.getMessage.contains("universes are not equal"))
  }

  test("intersect/difference/restrict are key-set ops") {
    val other = Table.fromDF(Seq((1L, "x"), (3L, "y")).toDF("id", "v"), Seq("id"))
    assert(rowsOf(people.intersect(other).df.select("id")) == Set(Seq(1L), Seq(3L)))
    assert(rowsOf(people.difference(other).df.select("id")) == Set(Seq(2L)))
    assert(rowsOf(people.restrict(other).df.select("id")) == Set(Seq(1L), Seq(3L)))
  }

  test("updateCells overwrites only matching cells") {
    val patch = Table.fromDF(Seq((2L, 99L)).toDF("id", "age"), Seq("id"))
    val out = people.updateCells(patch)
    assert(rowsOf(out.df.select("id", "age")) ==
      Set(Seq(1L, 25L), Seq(2L, 99L), Seq(3L, 28L)))
    // name column untouched
    assert(rowsOf(out.df.select("id", "name")).contains(Seq(2L, "bob")))
  }

  test("updateRows upserts whole rows") {
    val patch = Table.fromDF(
      Seq((2L, "bob2", 99L), (4L, "dave", 40L)).toDF("id", "name", "age"), Seq("id"))
    val out = people.updateRows(patch)
    assert(rowsOf(out.df) == Set(
      Seq(1L, "alice", 25L), Seq(2L, "bob2", 99L),
      Seq(3L, "carol", 28L), Seq(4L, "dave", 40L)))
  }

  test("ix looks rows up by key; optional keeps misses") {
    val keys = Table.fromDF(Seq((1L, "k1"), (5L, "k5")).toDF("id", "tag"), Seq("id"))
    assert(rowsOf(people.ix(keys).df.select("id", "name", "tag")) ==
      Set(Seq(1L, "alice", "k1")))
    val opt = people.ix(keys, optional = true)
    assert(rowsOf(opt.df.select("id", "name")) ==
      Set(Seq(1L, "alice"), Seq(5L, null)))
  }

  test("flatten explodes with origin position") {
    val t = Table.fromDF(
      Seq((1L, Seq("a", "b")), (2L, Seq("c"))).toDF("id", "xs"), Seq("id"))
    assert(rowsOf(t.flatten("xs").df) ==
      Set(Seq(1L, 0, "a"), Seq(1L, 1, "b"), Seq(2L, 0, "c")))
  }

  test("sortLinked yields prev/next pointers per instance (table.py:2157)") {
    val t = Table.fromDF(
      Seq((1L, "g1", 10L), (2L, "g1", 5L), (3L, "g2", 1L)).toDF("id", "g", "v"),
      Seq("id"))
    val out = t.sortLinked(Seq(col("v")), col("g"))
      .select("p" -> col("prev").getField("id"), "n" -> col("next").getField("id"))
    assert(rowsOf(out.df) == Set(
      Seq(2L, null, 1L), Seq(1L, 2L, null), Seq(3L, null, null)))
  }

  test("diff subtracts previous value in order (stdlib/ordered/diff.py)") {
    val t = Table.fromDF(
      Seq((1L, 1L, 10.0), (2L, 2L, 13.0), (3L, 3L, 11.0)).toDF("id", "t", "v"),
      Seq("id"))
    val out = t.diff(Seq(col("t")), None, "v")
    assert(rowsOf(out.df.select("id", "diff_v")) ==
      Set(Seq(1L, null), Seq(2L, 3.0), Seq(3L, -2.0)))
  }

  test("interpolate fills nulls linearly (_interpolate.py:33)") {
    val t = Table.fromDF(
      Seq((1L, 0.0, Some(0.0)), (2L, 2.0, None), (3L, 4.0, Some(8.0)),
        (4L, 5.0, None))
        .toDF("id", "t", "v"), Seq("id"))
    val out = t.interpolate(col("t"), Seq(col("id")), None, "v")
    assert(rowsOf(out.df.select("id", "v")) ==
      Set(Seq(1L, 0.0), Seq(2L, 4.0), Seq(3L, 8.0), Seq(4L, 8.0)))
    // per-instance: each key interpolates over its own timeline
    val t2 = Table.fromDF(
      Seq((1L, "a", 0.0, Some(0.0)), (2L, "a", 2.0, None), (3L, "a", 4.0, Some(8.0)),
        (4L, "b", 1.0, Some(1.0)), (5L, "b", 3.0, None), (6L, "b", 5.0, Some(5.0)))
        .toDF("id", "u", "t", "v"), Seq("id"))
    val out2 = t2.interpolate(col("t"), Seq(col("id")), Some(col("u")), "v")
    assert(rowsOf(out2.df.select("id", "v")) ==
      Set(Seq(1L, 0.0), Seq(2L, 4.0), Seq(3L, 8.0),
        Seq(4L, 1.0), Seq(5L, 3.0), Seq(6L, 5.0)))
  }

  test("deduplicateLatest keeps newest row per instance (table.py:1064)") {
    val t = Table.fromDF(
      Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u2", 5L)).toDF("id", "u", "t"),
      Seq("id"))
    val out = t.deduplicateLatest(struct(col("t"), col("id")), Seq("u"))
    assert(rowsOf(out.df.select("id")) == Set(Seq(2L), Seq(3L)))
  }

  test("gradualBroadcast walks the threshold monotonically (table.py:631)") {
    val t = Table.fromDF((1L to 200L).toDF("id"), Seq("id"))
    def trip(v: Double) = Seq((0.0, v, 10.0)).toDF("lo", "va", "up")
    def upperSet(v: Double): Set[Long] =
      t.gradualBroadcast(trip(v), col("lo"), col("va"), col("up"))
        .df.filter(col("apx_value") === 10.0)
        .collect().map(_.getLong(0)).toSet
    // endpoints: value=lower → nobody upper; value=upper → everybody
    assert(upperSet(0.0).isEmpty)
    assert(upperSet(10.0).size == 200)
    // the walk is GRADUAL: as value rises the upper-set only grows
    // (supersets), and mid-values take a nontrivial slice either way
    val steps = Seq(2.0, 5.0, 8.0).map(upperSet)
    assert(steps(0).subsetOf(steps(1)) && steps(1).subsetOf(steps(2)))
    assert(steps(1).size > 20 && steps(1).size < 180,
      s"value midway should flip a mid-sized slice, got ${steps(1).size}")
  }

  test("joinBloomPruned equals the exact join; outer modes raise") {
    val big = Table.fromDF((1L to 5000L).map(i => (i, i % 97))
      .toDF("id", "k"), Seq("id"))
    val small = Table.fromDF(Seq((3L, "a"), (7L, "b"), (11L, "c"))
      .toDF("k", "tag"), Seq("k"))
    val exact = big.joinOn(small, Seq("k")).df
    val pruned = big.joinBloomPruned(small, Seq("k")).df
    assert(rowsOf(pruned) == rowsOf(exact),
      "bloom pruning must not change join results")
    // semi mode keeps only left columns, same row set as exact semi
    val semi = big.joinBloomPruned(small, Seq("k"), "left_semi").df
    assert(semi.columns.toSeq == Seq("id", "k"))
    assert(rowsOf(semi) == rowsOf(
      big.df.join(small.df, Seq("k"), "left_semi").select("id", "k")))
    // an aggressive fpp still yields exact results (false positives die
    // in the join), only the pruning rate changes
    val sloppy = big.joinBloomPruned(small, Seq("k"), "inner",
      expectedItems = 3L, fpp = 0.5).df
    assert(rowsOf(sloppy) == rowsOf(exact))
    intercept[IllegalArgumentException] {
      big.joinBloomPruned(small, Seq("k"), "left")
    }
  }

  test("joinBloomAnti equals the exact anti join at any fpp") {
    val big = Table.fromDF((1L to 5000L).map(i => (i, i % 97))
      .toDF("id", "k"), Seq("id"))
    val block = Table.fromDF(Seq((3L, "a"), (7L, "b"), (11L, "c"))
      .toDF("k", "tag"), Seq("k"))
    val exact = big.df.join(block.df.select("k"), Seq("k"), "left_anti")
      .select("id", "k") // using-joins surface join keys first; align order
    val fast = big.joinBloomAnti(block, Seq("k")).df
    assert(fast.columns.toSeq == big.df.columns.toSeq)
    assert(rowsOf(fast) == rowsOf(exact))
    // a sloppy filter routes more rows through the exact branch but
    // cannot change the result
    val sloppy = big.joinBloomAnti(block, Seq("k"),
      expectedItems = 3L, fpp = 0.5).df
    assert(rowsOf(sloppy) == rowsOf(exact))
  }

  test("pivot widens over a static value list; unpivot inverts it") {
    val t = Table.fromDF(Seq(("x", "A", 1.0), ("x", "N", 2.0), ("y", "A", 3.0))
      .toDF("g", "k", "v"), Seq("g"))
    val wide = t.pivot(Seq(col("g")), col("k"), Seq("A", "N"), sum(col("v")))
    assert(wide.columns.toSeq == Seq("g", "A", "N"))
    assert(rowsOf(wide) == Set(Seq("x", 1.0, 2.0), Seq("y", 3.0, null)))
    // unlisted pivot values are dropped (SQL PIVOT ... IN semantics)
    val only = t.pivot(Seq(col("g")), col("k"), Seq("A"), sum(col("v")))
    assert(only.columns.toSeq == Seq("g", "A"))
    // unpivot round-trips the present cells
    val back = Table.fromDF(wide, Seq("g"))
      .unpivot(Seq(col("g")), Seq(col("A"), col("N")), "k", "v")
      .filter(col("v").isNotNull)
    assert(rowsOf(back) == rowsOf(t.df))
    // unpivot alone plans as a map-side Expand — zero exchanges (the
    // `back` chain above inherits the pivot's aggregate shuffle)
    val solo = t.unpivot(Seq(col("g")), Seq(col("v")), "k2", "v2")
    assert(!solo.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(solo.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("rollup/cube/grouping sets produce subtotal layers in one pass") {
    val t = Table.fromDF(Seq(("x", "p", 1L), ("x", "q", 2L), ("y", "p", 4L))
      .toDF("a", "b", "v"), Seq("a", "b"))
    val roll = t.groupbyRollup(col("a"), col("b"))
      .reduce("gid" -> grouping_id(), "s" -> sum(col("v")))
    assert(rowsOf(roll) == Set(
      Seq("x", "p", 0L, 1L), Seq("x", "q", 0L, 2L), Seq("y", "p", 0L, 4L),
      Seq("x", null, 1L, 3L), Seq("y", null, 1L, 4L),
      Seq(null, null, 3L, 7L)))
    val cube = t.groupbyCube(col("a"), col("b"))
      .reduce("gid" -> grouping_id(), "s" -> sum(col("v")))
    // cube = rollup layers + the (b)-only layer (gid 2)
    assert(rowsOf(cube) == rowsOf(roll) ++ Set(
      Seq(null, "p", 2L, 5L), Seq(null, "q", 2L, 2L)))
    val sets = t.groupbyGroupingSets(
        Seq(Seq(col("a")), Seq(col("b"))), col("a"), col("b"))
      .reduce("gid" -> grouping_id(), "s" -> sum(col("v")))
    assert(rowsOf(sets) == Set(
      Seq("x", null, 1L, 3L), Seq("y", null, 1L, 4L),
      Seq(null, "p", 2L, 5L), Seq(null, "q", 2L, 2L)))
    // ONE pass: a single Expand node feeds a single aggregate — no
    // per-layer union rescanning the input
    val plan = roll.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.toLowerCase.contains("union"))
  }
}
