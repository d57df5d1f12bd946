package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Graphs
import graft.SparkEntry.load

/** Oracle-checked queries for the iterate driver + graph library
  * (reference: pw.iterate internals/common.py:39; stdlib/graphs/).
  *
  * The graphs are constructed from the TPC-H-ish tables so the expected
  * result has a closed form the DuckDB oracle can state WITHOUT
  * iterating — while the implementation still runs the real distributed
  * fixpoint (pointer-jumping CC, power-iteration pagerank, relaxation
  * Bellman-Ford).
  */
object GraphQueries extends QueryModule {

  // Connected components over per-(nation, segment) customer chains:
  // consecutive custkeys are linked, so each (nation, segment) group is
  // one path; component representative = min custkey of the group.
  // Path graphs are the pointer-jumping stress case: rounds = log(len).
  q("q_connected_components",
    """SELECT c_custkey AS node,
      |  min(c_custkey) OVER (PARTITION BY c_nationkey, c_mktsegment) AS comp
      |FROM customer
      |QUALIFY count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) > 1""") { (s, dir) =>
    val c = load(s, dir, "customer")
    val w = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
    val edges = c.select(col("c_custkey").as("dst"),
        lag(col("c_custkey"), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
    Graphs.connectedComponents(edges)
  }

  // PageRank on the nation→region star graph (nodes offset to disjoint id
  // spaces). After 2 iterations ranks are stationary: nations (no
  // in-edges) sit at (1-d)/N; each region at (1-d)/N * (1 + d*fan_in).
  q("q_pagerank",
    """WITH cnt AS (SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1)
      |SELECT n_nationkey + 100 AS node,
      |  round(CAST(0.15 AS DOUBLE) / 30, 6) AS rank FROM nation
      |UNION ALL
      |SELECT r_regionkey AS node,
      |  round(CAST(0.15 AS DOUBLE) / 30
      |    + 0.85 * (coalesce(c, 0) * (CAST(0.15 AS DOUBLE) / 30)), 6) AS rank
      |FROM region LEFT JOIN cnt ON r_regionkey = n_regionkey""") { (s, dir) =>
    val edges = load(s, dir, "nation")
      .select((col("n_nationkey") + 100).as("src"), col("n_regionkey").as("dst"))
    Graphs.pagerank(edges, iterations = 5)
      .select(col("node"), round(col("rank"), 6).as("rank"))
  }

  // Bellman-Ford from region 0 over region→nation→customer tree edges
  // (unit weights): nations in region 0 at distance 1, their customers at
  // 2, everything else unreachable (dropped).
  q("q_bellman_ford",
    """SELECT CAST(0 AS BIGINT) AS node, CAST(0.0 AS DOUBLE) AS dist
      |UNION ALL
      |SELECT n_nationkey + 100, CAST(1.0 AS DOUBLE) FROM nation WHERE n_regionkey = 0
      |UNION ALL
      |SELECT c_custkey + 10000, CAST(2.0 AS DOUBLE)
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_regionkey = 0""") { (s, dir) =>
    val n = load(s, dir, "nation")
    val c = load(s, dir, "customer")
    val edges = n.select(col("n_regionkey").as("src"),
        (col("n_nationkey") + 100).as("dst"), lit(1.0).as("weight"))
      .unionByName(c.select((col("c_nationkey") + 100).as("src"),
        (col("c_custkey") + 10000).as("dst"), lit(1.0).as("weight")))
    Graphs.bellmanFord(edges, lit(0L))
  }
}
