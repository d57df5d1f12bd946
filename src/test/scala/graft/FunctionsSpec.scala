package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** Expression surface (reference: internals/expressions/ namespaces,
  * internals/common.py). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("pointer_from is a stable 16-byte key, instance-sensitive") {
    val df = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("a", "b")
      .select(pointer_from(col("a"), col("b")).as("p"))
    val ps = df.collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(ps(0) == ps(1) && ps(0) != ps(2))
    assert(ps(0).length == 16)
    val inst = Seq((1L, "x")).toDF("a", "b")
      .select(pointer_from_instance(lit("i1"), col("a"), col("b")).as("p"))
      .collect()(0).getAs[Array[Byte]](0).toSeq
    assert(inst != ps(0))
  }

  test("if_else / require / fill_error / get_or") {
    val df = Seq((Some(5L), Some(1L)), (None, Some(2L)), (Some(7L), None))
      .toDF("v", "dep")
      .select(
        if_else(col("v").isNotNull, lit("y"), lit("n")).as("ie"),
        require(col("v"), col("dep")).as("req"),
        fill_error(col("v"), lit(-1L)).as("fe"))
    assert(rowsOf(df) == Set(
      Seq("y", 5L, 5L), Seq("n", null, -1L), Seq("y", null, 7L)))
    val g = Seq(Seq("a", "b")).toDF("xs")
      .select(get_or(col("xs"), 0, lit("z")).as("g0"),
        get_or(col("xs"), 5, lit("z")).as("g5"))
    assert(rowsOf(g) == Set(Seq("a", "z")))
  }

  test("unwrap raises on null") {
    val ok = Seq(1L).toDF("v").select(unwrap(col("v")))
    assert(ok.collect().head.getLong(0) == 1L)
    val bad = Seq(Some(1L), None).toDF("v").select(unwrap(col("v")))
    intercept[Exception] { bad.collect() }
  }

  test("str namespace: swapcase, title, count, find, remove prefix/suffix") {
    val df = Seq("Hello World").toDF("s").select(
      col("s").strSwapCase.as("sw"), col("s").strTitle.as("ti"),
      col("s").strCount(lit("l")).as("cnt"), col("s").strFind(lit("World")).as("f"),
      col("s").strRemovePrefix(lit("Hello ")).as("rp"),
      col("s").strRemoveSuffix(lit(" World")).as("rs"),
      col("s").strSlice(0, 5).as("sl"))
    assert(rowsOf(df) == Set(Seq("hELLO wORLD", "Hello World", 3L, 6L, "World", "Hello", "Hello")))
  }

  test("parse_int/float/bool are try-casts (null on garbage)") {
    val df = Seq(("12", "1.5", "true"), ("x", "y", "z")).toDF("a", "b", "c")
      .select(col("a").parseInt.as("i"), col("b").parseFloat.as("f"),
        col("c").parseBool.as("bo"))
    assert(rowsOf(df) == Set(Seq(12L, 1.5, true), Seq(null, null, null)))
  }

  test("json_get extracts path") {
    val df = Seq("""{"k": 42, "nested": {"x": "v"}}""").toDF("j")
      .select(json_get(col("j"), "k").as("k"),
        json_get(col("j"), "nested.x").as("nx"))
    assert(rowsOf(df) == Set(Seq("42", "v")))
  }

  test("json_typed: typed extraction, NULL on absent path or mismatch") {
    import org.apache.spark.sql.types._
    val df = Seq("""{"i": 42, "f": 1.5, "s": "abc", "b": true}""").toDF("j")
      .select(
        json_typed(col("j"), "i", LongType).as("i"),
        json_typed(col("j"), "f", DoubleType).as("f"),
        json_typed(col("j"), "b", BooleanType).as("b"),
        json_typed(col("j"), "missing", LongType).as("m"),
        json_typed(col("j"), "s", LongType).as("mismatch"))
    assert(rowsOf(df) == Set(Seq(42L, 1.5, true, null, null)))
  }

  test("json_object: struct-schema parse, NULL per mistyped field") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("i", LongType), StructField("s", StringType)))
    val df = Seq("""{"i": 7, "s": "ok"}""", """{"i": "garbage", "s": "x"}""",
        "not json at all").toDF("j")
      .select(json_object(col("j"), schema).as("o"))
      .select(col("o").getField("i").as("i"), col("o").getField("s").as("s"))
    assert(rowsOf(df) == Set(Seq(7L, "ok"), Seq(null, "x"), Seq(null, null)))
  }

  test("dt.round rounds to the NEAREST boundary; dt.floor truncates") {
    val df = Seq("2024-03-05 10:59:30", "2024-03-05 10:10:00",
        "2024-03-05 10:30:00").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
      .select(col("ts").dtRound("hour").as("r"), col("ts").dtFloor("hour").as("f"))
      .select(col("r").cast("string"), col("f").cast("string"))
    assert(rowsOf(df) == Set(
      Seq("2024-03-05 11:00:00", "2024-03-05 10:00:00"), // 10:59:30 rounds up
      Seq("2024-03-05 10:00:00", "2024-03-05 10:00:00"), // 10:10 rounds down
      Seq("2024-03-05 11:00:00", "2024-03-05 10:00:00"))) // tie rounds up
    intercept[IllegalArgumentException] {
      Seq("2024-03-05").toDF("s").select(col("s").cast("timestamp").dtRound("month"))
    }
  }
}
