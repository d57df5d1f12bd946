package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.sqlapi.{GraftExtensions, GraftSqlFunctions}

/** The pure-SQL surface: registered functions must build the SAME plan
  * nodes as the Column API (not UDF wrappers), enforce literal config
  * args, and be injectable via spark.sql.extensions. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftSqlFunctions.register(spark)

  private def docs = Seq(
    (1L, "a b c d e"), (2L, "x y"), (3L, "a a a a")).toDF("id", "text")

  test("SQL functions equal their Column-API twins") {
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_shingles(text, 3) AS sh,
        |  graft_hash_embed(text, 4) AS emb,
        |  graft_dot(graft_hash_embed(text, 4), graft_hash_embed(text, 4)) AS dd,
        |  graft_chunks(text, 'c', 2) AS ch
        |FROM sqlfn_docs""".stripMargin)
    val viaCols = docs.select(col("id"),
      graft.plans.TextExprs.shingles(col("text"), 3, distinct = true).as("sh"),
      graft.plans.VecExprs.hashEmbed(col("text"), 4).as("emb"),
      graft.plans.VecExprs.dotProduct(
        graft.plans.VecExprs.hashEmbed(col("text"), 4),
        graft.plans.VecExprs.hashEmbed(col("text"), 4)).as("dd"),
      graft.plans.TextExprs.chunkBySep(col("text"), "c", 2).as("ch"))
    assert(rowsOf(viaSql) == rowsOf(viaCols))
    // the SQL path must plan the NATIVE node, not a UDF wrapper
    val plan = viaSql.queryExecution.analyzed.toString
    assert(plan.contains("shingles") || plan.contains("Shingles"))
    assert(!plan.contains("UDF"))
  }

  test("winnow via SQL matches the Column API") {
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      "SELECT id, graft_winnow(text, 2, 2) AS fp FROM sqlfn_docs")
    val viaCols = docs.select(col("id"),
      graft.plans.TextExprs.winnow(col("text"), 2, 2).as("fp"))
    assert(rowsOf(viaSql) == rowsOf(viaCols))
  }

  test("sign_pack/hamming via SQL match the Column API") {
    val vecs = Seq((1L, Seq(1.0, -1.0, 2.0)), (2L, Seq(-1.0, 1.0, 0.0)))
      .toDF("id", "v")
    vecs.createOrReplaceTempView("sqlfn_vecs")
    val viaSql = spark.sql(
      """SELECT a.id AS i, b.id AS j,
        |  graft_hamming(graft_sign_pack(a.v), graft_sign_pack(b.v)) AS h
        |FROM sqlfn_vecs a JOIN sqlfn_vecs b""".stripMargin)
    val viaCols = vecs.select(col("id").as("i"),
        graft.plans.VecExprs.signPack(col("v")).as("pa"))
      .crossJoin(vecs.select(col("id").as("j"),
        graft.plans.VecExprs.signPack(col("v")).as("pb")))
      .select(col("i"), col("j"),
        graft.plans.VecExprs.hamming(col("pa"), col("pb")).as("h"))
    assert(rowsOf(viaSql) == rowsOf(viaCols))
    // signs differ in dims 1 and 2 (0.0 packs as 0-bit like -1)
    assert(viaSql.filter(col("i") === 1 && col("j") === 2)
      .collect()(0).getInt(2) == 3)
  }

  test("match_terms via SQL matches the Column API") {
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      "SELECT id, graft_match_terms(text, array('a b', 'x', 'q')) AS h " +
        "FROM sqlfn_docs")
    val viaCols = docs.select(col("id"),
      graft.plans.TextExprs.matchTerms(col("text"), Seq("a b", "x", "q")).as("h"))
    assert(rowsOf(viaSql) == rowsOf(viaCols))
    // non-literal term array fails loudly
    intercept[Exception] {
      spark.sql("SELECT graft_match_terms(text, array(text)) FROM sqlfn_docs")
        .collect()
    }
  }

  test("geometry arguments must be literals; arity is enforced") {
    docs.createOrReplaceTempView("sqlfn_docs")
    intercept[Exception] { // non-literal dim
      spark.sql("SELECT graft_hash_embed(text, CAST(id AS INT)) FROM sqlfn_docs")
        .collect()
    }
    intercept[Exception] { // wrong arity
      spark.sql("SELECT graft_dot(text) FROM sqlfn_docs").collect()
    }
  }

  test("GraftExtensions injects every function without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
    // idempotent re-register on a live session
    GraftSqlFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0) == 11.0)
  }
}
