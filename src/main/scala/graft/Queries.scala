package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Table
import graft.agg.reducers
import graft.SparkEntry.{load, table}

/** The driver-checked query inventory. Every query name maps 1:1 to a
  * SURVEY.md §2 operator; the companion oracle SQL (DuckDB dialect) is in
  * [[oracles]]. Floating-point aggregates are rounded to 4 decimals on
  * BOTH sides so partial-aggregation order can't flip the hash.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  val all = scala.collection.mutable.LinkedHashMap[String, Q]()
  val oracles = scala.collection.mutable.LinkedHashMap[String, String]()

  private def q(name: String, oracle: String = null)(fn: Q): Unit = {
    all(name) = fn
    if (oracle != null) oracles(name) = oracle
  }

  private def r4(c: Column): Column = round(c, 4)

  // =====================================================================
  // §2.1 groupby/reduce — flagship (TPC-H Q1 shape, SURVEY §7.2)
  // =====================================================================
  q("q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_returnflag"), col("l_linestatus"))
      .reduce(
        "sum_qty" -> r4(reducers.rsum(col("l_quantity"))),
        "sum_base_price" -> r4(reducers.rsum(col("l_extendedprice"))),
        "sum_disc_price" -> r4(reducers.rsum(col("l_extendedprice") * (lit(1) - col("l_discount")))),
        "avg_qty" -> r4(reducers.ravg(col("l_quantity"))),
        "avg_disc" -> r4(reducers.ravg(col("l_discount"))),
        "count_order" -> reducers.rcount())
  }
}
