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

  def sql(spark: SparkSession, query: String, tables: (String, Table)*): DataFrame =
    sqlDF(spark, query, tables.map { case (n, t) => n -> t.df }: _*)

  /** DataFrame-direct overload. Views live only for the duration of the
    * call: `spark.sql` ANALYZES eagerly (the returned plan holds the
    * resolved view children, not catalog references), so the views are
    * dropped — or a caller's shadowed temp view of the same name
    * restored — before returning, and executing the result later still
    * works.
    *
    * The register→analyze→restore window runs under a process-wide lock:
    * temp views live in the shared session catalog, so two concurrent
    * calls binding the same name would otherwise read each other's
    * frames (graft.Verify drives queries from a thread pool on one
    * session). The lock covers only ANALYSIS — execution of the returned
    * frame stays fully parallel. */
  def sqlDF(spark: SparkSession, query: String, tables: (String, DataFrame)*): DataFrame =
    lock.synchronized {
      val prior: Seq[(String, Option[DataFrame])] = tables.map { case (name, _) =>
        name -> scala.util.Try(spark.catalog.getTable(name))
          .toOption.filter(_.isTemporary).map(_ => spark.table(name))
      }
      tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
      try spark.sql(query)
      finally prior.foreach {
        case (name, Some(old)) => old.createOrReplaceTempView(name)
        case (name, None) => spark.catalog.dropTempView(name); ()
      }
    }

  private val lock = new Object
}
