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

  test("Schema: primaryKey keys the table, defaults fill nulls AND missing columns (schema.py:913)") {
    import spark.implicits._
    import graft.core.{ColumnDef, Schema}
    import org.apache.spark.sql.types._
    val schema = Schema.of(
      ColumnDef("id", LongType, primaryKey = true),
      ColumnDef("name", StringType, default = Some("unknown")),
      ColumnDef("score", DoubleType, default = Some(0.0)))
    // 'score' column entirely absent; one null name
    val df = Seq((1L, "alice"), (2L, null)).toDF("id", "name")
    val t = schema(df)
    assert(t.key == Seq("id"))
    assert(t.df.columns.toSeq == Seq("id", "name", "score"))
    assert(rowsOf(t.df) == Set(
      Seq(1L, "alice", 0.0), Seq(2L, "unknown", 0.0)))
  }

  test("Schema.fromCsv infers types from a sample (schema_from_csv, schema.py:832)") {
    import graft.core.Schema
    val dir = java.nio.file.Files.createTempDirectory("graft_schema").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "id,name,score\n1,alice,1.5\n2,bob,2.25\n")
    val s = Schema.fromCsv(spark, s"$dir/t.csv", primaryKey = Seq("id"))
    assert(s.primaryKey == Seq("id"))
    assert(s.structType.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("id", "integer"), ("name", "string"), ("score", "double")))
  }

  test("Schema.checkAppendOnly raises on mutated append-only column, passes appends") {
    import spark.implicits._
    import graft.core.{ColumnDef, Schema, Table}
    import org.apache.spark.sql.types._
    val schema = Schema.of(
      ColumnDef("id", LongType, primaryKey = true),
      ColumnDef("created", StringType, appendOnly = true),
      ColumnDef("v", LongType))
    val old = Table.fromDF(Seq((1L, "t0", 10L)).toDF("id", "created", "v"), Seq("id"))
    // new key + changed mutable column: fine
    val good = Table.fromDF(Seq((1L, "t0", 99L), (2L, "t1", 0L))
      .toDF("id", "created", "v"), Seq("id"))
    assert(Schema.checkAppendOnly(schema, old, good).df.count() == 2)
    // mutated append-only column for existing key: raises
    val bad = Table.fromDF(Seq((1L, "t9", 10L)).toDF("id", "created", "v"), Seq("id"))
    val ex = intercept[Exception] {
      Schema.checkAppendOnly(schema, old, bad).df.count()
    }
    assert(ex.getMessage.contains("append_only") ||
      ex.getCause != null && ex.getCause.getMessage.contains("append_only"))
  }
}
