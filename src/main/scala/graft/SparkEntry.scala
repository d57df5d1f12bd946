package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Table

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator from SURVEY.md §2 via
  * the graft library; [[oracleSql]] holds the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private[graft] def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has shipped with two physical `ts` encodings across
    * testdata generations: TIMESTAMP(NANOS) (which Spark's parquet reader
    * rejects — read nanos as long via the legacy conf and truncate to µs)
    * and plain TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ). Normalize both to a session-UTC TimestampType column
    * so every downstream query and written snapshot keeps one schema. */
  private[graft] def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division — `/` would go through double and lose low bits
        // of the ~1.7e18 ns value (ulp ≈ 256 ns), flipping truncated µs vs
        // the oracle's exact conversion
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // session TZ is UTC in every graft entrypoint, so this cast is a
        // pure type-tag change (same instant, same µs value)
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  private[graft] def table(spark: SparkSession, dir: String, name: String, key: String*): Table =
    Table.fromDF(load(spark, dir, name), key.toSeq)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (SURVEY §7.2 minimum slice). */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q1_agg")(spark, "/root/testdata/sf0.001")

  private def modules: Seq[QueryModule] =
    Seq(Queries, TemporalQueries, GraphQueries, PipelineQueries, FacadeQueries,
      RetrievalQueries, TpchQueries, IoQueries, DocStoreQueries)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.all).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
