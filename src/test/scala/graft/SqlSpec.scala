package graft

import graft.core.Table
import graft.sqlapi.Sql

/** sql() façade catalog hygiene (reference: internals/sql.py:613). */
class SqlSpec extends SparkSpec {
  import spark.implicits._

  test("sql registers views only for the call; result executes after cleanup") {
    val t = Table.fromDF(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    val out = Sql.sql(spark, "SELECT count(*) AS n FROM sqlspec_t", "sqlspec_t" -> t)
    // view already dropped, but the analyzed plan still executes
    assert(!spark.catalog.tableExists("sqlspec_t"))
    assert(out.head.getLong(0) == 2L)
  }

  test("sql restores a caller's shadowed temp view") {
    Seq((99L, "mine")).toDF("id", "v").createOrReplaceTempView("sqlspec_shared")
    val t = Table.fromDF(Seq((1L, "theirs")).toDF("id", "v"), Seq("id"))
    val out = Sql.sql(spark, "SELECT v FROM sqlspec_shared", "sqlspec_shared" -> t)
    assert(out.head.getString(0) == "theirs") // the call saw the override
    // ...but the caller's original view is back afterwards
    assert(spark.table("sqlspec_shared").head.getString(1) == "mine")
    spark.catalog.dropTempView("sqlspec_shared")
  }
}
