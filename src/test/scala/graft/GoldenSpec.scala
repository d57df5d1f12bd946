package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming
import graft.testkit.Testkit

/** Golden parity with the reference's own doctest examples — the same
  * inputs must produce the same outputs (reference: table.py sort
  * doctest :2180-2211, deduplicate doctest :1095-1150). Ids are compared
  * through natural keys (names), not raw pointer bytes (SURVEY §7.4). */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  test("sort doctest: global order by age (table.py:2180)") {
    val t = Testkit.fromMarkdown(spark,
      """name     | age | score
        |Alice    | 25  | 80
        |Bob      | 20  | 90
        |Charlie  | 30  | 80""".stripMargin, key = Seq("name"))
    val out = t.sortLinked(Seq(col("age")), lit(1))
      .select("prev" -> col("prev").getField("name"),
        "next" -> col("next").getField("name"))
    assert(rowsOf(out.df) == Set(
      Seq("Alice", "Bob", "Charlie"),
      Seq("Bob", null, "Alice"),
      Seq("Charlie", "Alice", null)))
  }

  test("sort doctest: per-instance order (table.py:2195)") {
    val t = Testkit.fromMarkdown(spark,
      """name     | age | score
        |Alice    | 25  | 80
        |Bob      | 20  | 90
        |Charlie  | 30  | 80
        |David    | 35  | 90
        |Eve      | 15  | 80""".stripMargin, key = Seq("name"))
    val out = t.sortLinked(Seq(col("age")), col("score"))
      .select("prev" -> col("prev").getField("name"),
        "next" -> col("next").getField("name"))
    assert(rowsOf(out.df) == Set(
      Seq("Alice", "Eve", "Charlie"),
      Seq("Bob", null, "David"),
      Seq("Charlie", "Alice", null),
      Seq("David", "Bob", null),
      Seq("Eve", null, "Alice")))
  }

  test("deduplicate doctest: acceptor new >= old + 2 (table.py:1095)") {
    implicit val sqlCtx = spark.sqlContext
    val batches = Testkit.timedBatches(spark,
      """val | __time__
        | 1  |     2
        | 2  |     4
        | 3  |     6
        | 4  |     8""".stripMargin)
    val in = MemoryStream[Long]
    val out = Streaming.deduplicateStreaming[Int, Long](
      in.toDS(), _ => 0, (n, p) => n >= p + 2)
    val q = out.toDF("val").writeStream.format("memory")
      .queryName("golden_dedup").outputMode("update").start()
    try {
      batches.foreach { case (_, df) =>
        in.addData(df.collect().map(_.getLong(0)).toSeq)
        q.processAllAvailable()
      }
      // reference update stream: 1 accepted @t2, replaced by 3 @t6;
      // 2 and 4 rejected — emissions are exactly [1, 3]
      val got = spark.sql("SELECT val FROM golden_dedup").collect()
        .map(_.getLong(0)).toList
      assert(got == List(1L, 3L))
    } finally q.stop()
  }

  test("deduplicate doctest: per-instance acceptor (table.py:1116)") {
    implicit val sqlCtx = spark.sqlContext
    val batches = Testkit.timedBatches(spark,
      """val | instance | __time__
        | 1  |     1    |     2
        | 2  |     1    |     4
        | 3  |     2    |     6
        | 4  |     1    |     8
        | 4  |     2    |     8
        | 5  |     1    |    10""".stripMargin)
    val in = MemoryStream[(Long, Long)]
    val out = Streaming.deduplicateStreaming[Long, (Long, Long)](
      in.toDS(), _._2, (n, p) => n._1 >= p._1 + 2)
    val q = out.toDF("val", "instance").writeStream.format("memory")
      .queryName("golden_dedup2").outputMode("update").start()
    try {
      batches.foreach { case (_, df) =>
        in.addData(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
        q.processAllAvailable()
      }
      // reference: (1,inst1)@2, (3,inst2)@6, (4,inst1)@8; 2/4@inst2/5 rejected
      val got = spark.sql("SELECT val, instance FROM golden_dedup2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      assert(got == List((1L, 1L), (3L, 2L), (4L, 1L)))
    } finally q.stop()
  }

  test("groupby/reduce doctest: sum per (pet, owner) (table.py:942)") {
    val t1 = Testkit.fromMarkdown(spark, """age | owner | pet
        |10 | Alice | dog
        |9  | Bob   | dog
        |8  | Alice | cat
        |7  | Bob   | dog""".stripMargin)
    val out = t1.groupby(col("pet"), col("owner"))
      .reduce("ageagg" -> sum(col("age")))
      .select("owner", "pet", "ageagg")
    assert(rowsOf(out) == Set(
      Seq("Alice", "cat", 8L), Seq("Alice", "dog", 10L),
      Seq("Bob", "dog", 16L)))
  }

  test("ix doctest: pointer lookup into another table (table.py:1164)") {
    val animals = Testkit.fromMarkdown(spark, """id | epithet    | genus
        |1 | upupa      | epops
        |2 | acherontia | atropos
        |3 | bubo       | scandiacus
        |4 | dynastes   | hercules""".stripMargin, key = Seq("id"))
    val birds = Testkit.fromMarkdown(spark, """id | desc
        |2 | hoopoe
        |4 | owl""".stripMargin, key = Seq("id"))
    val out = animals.ix(birds).df.select(col("desc"), col("genus").as("latin"))
    assert(rowsOf(out) == Set(Seq("hoopoe", "atropos"), Seq("owl", "hercules")))
  }

  test("update_cells / update_rows doctests (table.py:1439 / :1524)") {
    val t1 = Testkit.fromMarkdown(spark, """id | age | owner | pet
        |1 | 10 | Alice | 1
        |2 | 9  | Bob   | 1
        |3 | 8  | Alice | 2""".stripMargin, key = Seq("id"))
    val cells = Testkit.fromMarkdown(spark, """id | age | owner | pet
        |1 | 10 | Alice | 30""".stripMargin, key = Seq("id"))
    val t3 = t1.updateCells(cells).df.select("age", "owner", "pet")
    assert(rowsOf(t3) == Set(
      Seq(8L, "Alice", 2L), Seq(9L, "Bob", 1L), Seq(10L, "Alice", 30L)))

    val rows = Testkit.fromMarkdown(spark, """id | age | owner | pet
        |1  | 10 | Alice | 30
        |12 | 12 | Tom   | 40""".stripMargin, key = Seq("id"))
    val t4 = t1.updateRows(rows).df.select("age", "owner", "pet")
    assert(rowsOf(t4) == Set(
      Seq(8L, "Alice", 2L), Seq(9L, "Bob", 1L), Seq(10L, "Alice", 30L),
      Seq(12L, "Tom", 40L)))
  }

  test("flatten doctest: string column explodes to characters (table.py:2104)") {
    val t = Testkit.fromMarkdown(spark, """pet | age
        |Dog | 2
        |Cat | 5""".stripMargin)
    val out = t.flatten("pet").df.select("pet", "age")
    assert(rowsOf(out) == Set(
      Seq("C", 5L), Seq("D", 2L), Seq("a", 5L), Seq("g", 2L),
      Seq("o", 2L), Seq("t", 5L)))
  }

  test("interpolate doctest: linear fill of both columns (_interpolate.py:33)") {
    val t = Testkit.fromMarkdown(spark, """timestamp | values_a | values_b
        |1 | 1    | 10
        |2 | None | None
        |3 | 3    | None
        |4 | None | None
        |5 | None | None
        |6 | 6    | 60""".stripMargin, key = Seq("timestamp"))
    val cast = new graft.core.Table(
      t.df.withColumn("values_a", col("values_a").cast("double"))
        .withColumn("values_b", col("values_b").cast("double")), t.key)
    val out = cast.interpolate(col("timestamp"), Nil, None,
      "values_a", "values_b").df
    assert(rowsOf(out) == Set(
      Seq(1L, 1.0, 10.0), Seq(2L, 2.0, 20.0), Seq(3L, 3.0, 30.0),
      Seq(4L, 4.0, 40.0), Seq(5L, 5.0, 50.0), Seq(6L, 6.0, 60.0)))
  }

  test("diff doctest: global and per-instance (ordered/diff.py:42)") {
    val t1 = Testkit.fromMarkdown(spark, """timestamp | values
        |1 | 1
        |2 | 2
        |3 | 4
        |4 | 7
        |5 | 11
        |6 | 16""".stripMargin, key = Seq("timestamp"))
    val out1 = t1.diff(Seq(col("timestamp").asc), None, "values").df
      .select("timestamp", "diff_values")
    assert(rowsOf(out1) == Set(
      Seq(1L, null), Seq(2L, 1L), Seq(3L, 2L), Seq(4L, 3L),
      Seq(5L, 4L), Seq(6L, 5L)))

    val t2 = Testkit.fromMarkdown(spark, """timestamp | instance | values
        |1 | 0 | 1
        |2 | 1 | 2
        |3 | 1 | 4
        |3 | 0 | 7
        |6 | 1 | 11
        |6 | 0 | 16""".stripMargin)
    val out2 = t2.diff(Seq(col("timestamp").asc), Some(col("instance")), "values")
      .df.select("timestamp", "instance", "diff_values")
    assert(rowsOf(out2) == Set(
      Seq(1L, 0L, null), Seq(2L, 1L, null), Seq(3L, 0L, 6L),
      Seq(3L, 1L, 2L), Seq(6L, 0L, 9L), Seq(6L, 1L, 7L)))
  }

  test("windowby tumbling doctest: duration 5 per instance (_window.py:756)") {
    val t = Testkit.fromMarkdown(spark, """instance | t
        |0        | 12
        |0        | 13
        |0        | 14
        |0        | 15
        |0        | 16
        |0        | 17
        |1        | 12
        |1        | 13""".stripMargin).df
      .select(col("instance"), col("t"),
        timestamp_seconds(col("t")).as("ts"))
    val w = graft.operators.Temporal.tumble(col("ts"), durationSec = 5)
    val out = t.groupBy(col("instance"), unix_seconds(w).as("start"))
      .agg(min(col("t")).as("min_t"), max(col("t")).as("max_t"),
        count(lit(1)).as("count"))
      .withColumn("end", col("start") + 5)
      .select("instance", "start", "end", "min_t", "max_t", "count")
    assert(rowsOf(out) == Set(
      Seq(0L, 10L, 15L, 12L, 14L, 3L),
      Seq(0L, 15L, 20L, 15L, 17L, 3L),
      Seq(1L, 10L, 15L, 12L, 13L, 2L)))
  }

  test("windowby sliding doctest: duration 10 hop 3 per instance (_window.py:685)") {
    val t = Testkit.fromMarkdown(spark, """instance | t
        |0 | 12
        |0 | 13
        |0 | 14
        |0 | 15
        |0 | 16
        |0 | 17
        |1 | 10
        |1 | 11""".stripMargin).df
      .select(col("instance"), col("t"), timestamp_seconds(col("t")).as("ts"))
    val out = graft.operators.Temporal.assignSliding(t, col("ts"),
        durationSec = 10, hopSec = 3)
      .groupBy(col("instance"), unix_seconds(col("window_start")).as("start"),
        unix_seconds(col("window_end")).as("end"))
      .agg(min(col("t")).as("min_t"), max(col("t")).as("max_t"),
        count(lit(1)).as("count"))
    assert(rowsOf(out.select("instance", "start", "end", "min_t", "max_t", "count")) == Set(
      Seq(0L, 3L, 13L, 12L, 12L, 1L),
      Seq(0L, 6L, 16L, 12L, 15L, 4L),
      Seq(0L, 9L, 19L, 12L, 17L, 6L),
      Seq(0L, 12L, 22L, 12L, 17L, 6L),
      Seq(0L, 15L, 25L, 15L, 17L, 3L),
      Seq(1L, 3L, 13L, 10L, 11L, 2L),
      Seq(1L, 6L, 16L, 10L, 11L, 2L),
      Seq(1L, 9L, 19L, 10L, 11L, 2L)))
  }

  test("windowby session-predicate doctest (_window.py:884)") {
    val t = Testkit.fromMarkdown(spark, """instance | t  | v
        |0        | 1  | 10
        |0        | 2  | 1
        |0        | 4  | 3
        |0        | 8  | 2
        |0        | 9  | 4
        |0        | 10 | 8
        |1        | 1  | 9
        |1        | 2  | 16""".stripMargin).df
      .select(col("instance"), timestamp_seconds(col("t")).as("ts"), col("v"),
        col("t"))
    // session(predicate=|a-b| <= 1), per instance
    val sess = graft.operators.Temporal.sessionizeBy(t, col("ts"),
      Seq(col("instance")),
      (a, b) => abs(unix_seconds(b) - unix_seconds(a)) <= 1)
    val out = sess.groupBy(col("instance"), col("session_start"))
      .agg(min(col("t")).as("min_t"), max(col("v")).as("max_v"),
        count(lit(1)).as("count"))
      .select(col("instance"), col("min_t"), col("max_v"), col("count"))
    assert(rowsOf(out) == Set(
      Seq(0L, 1L, 10L, 2L), Seq(0L, 4L, 3L, 1L),
      Seq(0L, 8L, 8L, 3L), Seq(1L, 1L, 16L, 2L)))
  }

  test("interval_join doctest: interval(-2, 1) (_interval_join.py:79)") {
    val t1 = Testkit.fromMarkdown(spark, """t
        |3
        |4
        |5
        |11""".stripMargin).df
      .select(timestamp_seconds(col("t")).as("lt"))
    val t2 = Testkit.fromMarkdown(spark, """t
        |0
        |1
        |4
        |7""".stripMargin).df
      .select(timestamp_seconds(col("t")).as("rt"))
    val out = graft.operators.Temporal.intervalJoin(
        t1, t2, col("lt"), col("rt"), lbSec = -2, ubSec = 1)
      .select(unix_seconds(col("lt")).as("left_t"),
        unix_seconds(col("rt")).as("right_t"))
    assert(rowsOf(out) == Set(
      Seq(3L, 1L), Seq(3L, 4L), Seq(4L, 4L), Seq(5L, 4L)))
  }

  test("intervals_over doctest: sorted_tuple per probe (_window.py:821)") {
    val data = Testkit.fromMarkdown(spark, """t  | v
        |1  | 10
        |2  | 1
        |4  | 3
        |8  | 2
        |9  | 4
        |10 | 8
        |1  | 9
        |2  | 16""".stripMargin).df
      .select(timestamp_seconds(col("t")).as("dt"), col("v"))
    val probes = Testkit.fromMarkdown(spark, """t
        |2
        |4
        |6
        |8
        |10""".stripMargin).df
      .select(timestamp_seconds(col("t")).as("pt"))
    val out = graft.operators.Temporal.intervalsOver(
        probes, data, col("pt"), col("dt"), lbSec = -2, ubSec = 1)
      .groupBy(unix_seconds(col("pt")).as("loc"))
      .agg(array_sort(collect_list(col("v"))).as("v"))
      .select(col("loc"), concat_ws(",", transform(col("v"),
        x => x.cast("string"))).as("v"))
    assert(rowsOf(out) == Set(
      Seq(2L, "1,9,10,16"), Seq(4L, "1,3,16"), Seq(6L, "3"),
      Seq(8L, "2,4"), Seq(10L, "2,4,8")))
  }

  test("asof_join doctest: LEFT backward with defaults (_asof_join.py:513)") {
    val t1 = Testkit.fromMarkdown(spark, """K | val | t
        |0 | 1   | 1
        |0 | 2   | 4
        |0 | 3   | 5
        |0 | 4   | 6
        |0 | 5   | 7
        |0 | 6   | 11
        |0 | 7   | 12
        |1 | 8   | 5
        |1 | 9   | 7""".stripMargin).df
      .select(col("K"), col("val"), timestamp_seconds(col("t")).as("t"))
    val t2 = Testkit.fromMarkdown(spark, """K | val | t
        |1 | 7   | 2
        |1 | 3   | 8
        |0 | 0   | 2
        |0 | 6   | 3
        |0 | 2   | 7
        |0 | 3   | 8
        |0 | 9   | 9
        |0 | 7   | 13
        |0 | 4   | 14""".stripMargin).df
      .select(col("K"), col("val").as("rval"),
        timestamp_seconds(col("t")).as("rt"))
    val joined = graft.operators.Temporal.asofJoin(
      t1, t2, col("t"), col("rt"), Seq("K"), graft.operators.Temporal.Backward,
      how = "left")
    // defaults={t2.val: -1}: the default substitutes into every use
    val out = joined.select(col("K").as("instance"),
      unix_seconds(col("t")).as("t"), col("val").as("val_left"),
      coalesce(col("rval"), lit(-1L)).as("val_right"),
      (col("val") + coalesce(col("rval"), lit(-1L))).as("sum"))
    assert(rowsOf(out) == Set(
      Seq(0L, 1L, 1L, -1L, 0L), Seq(0L, 4L, 2L, 6L, 8L),
      Seq(0L, 5L, 3L, 6L, 9L), Seq(0L, 6L, 4L, 6L, 10L),
      Seq(0L, 7L, 5L, 2L, 7L), Seq(0L, 11L, 6L, 9L, 15L),
      Seq(0L, 12L, 7L, 9L, 16L), Seq(1L, 5L, 8L, 7L, 15L),
      Seq(1L, 7L, 9L, 7L, 16L)))
  }
}
