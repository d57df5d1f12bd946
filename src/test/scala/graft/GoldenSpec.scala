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
}
