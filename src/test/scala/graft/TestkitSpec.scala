package graft

import graft.testkit.Testkit

/** Markdown-table testkit (reference: pw.debug.table_from_markdown). */
class TestkitSpec extends SparkSpec {

  test("fromMarkdown infers types and nulls") {
    val t = Testkit.fromMarkdown(spark,
      """!| id | name  | score | ok    |
        !| -- | ----- | ----- | ----- |
        !| 1  | alice | 1.5   | true  |
        !| 2  |       | 2.0   | false |
        !| 3  | carol | None  | true  |""".stripMargin('!'), key = Seq("id"))
    assert(t.df.schema.map(_.dataType.typeName) ==
      Seq("long", "string", "double", "boolean"))
    assert(rowsOf(t.df) == Set(
      Seq(1L, "alice", 1.5, true), Seq(2L, null, 2.0, false),
      Seq(3L, "carol", null, true)))
  }

  test("timedBatches splits by __time__ in order") {
    val batches = Testkit.timedBatches(spark,
      """ v | __time__
         a | 2
         b | 1
         c | 2""")
    assert(batches.map(_._1) == Seq(1L, 2L))
    assert(rowsOf(batches(1)._2) == Set(Seq("a"), Seq("c")))
  }

  test("show dumps a stable golden string") {
    val t = Testkit.fromMarkdown(spark, "x\n2\n1")
    assert(Testkit.show(t) == "x\n1\n2")
  }
}
