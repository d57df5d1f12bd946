package graft

import org.apache.spark.sql.functions._
import graft.core.Table
import graft.agg.reducers
import graft.SparkEntry.{load, table}

/** TPC-H-shaped headline queries (Q3/Q5/Q10 analogs) — multi-join +
  * aggregation plans over the full schema, the shapes that dominate a
  * 100 TB analytics workload. All joins are declared; Catalyst picks
  * broadcast vs shuffled-hash vs SMJ per side statistics, AQE re-plans at
  * runtime. Float aggregates use the decimal-exact [[QueryModule.dsum]].
  */
object TpchQueries extends QueryModule {

  // Q3 shape: shipping priority — 3-way join, filter both sides, ranked agg
  q("q3_shipping_priority",
    """SELECT l_orderkey,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE), 4) AS revenue,
      |  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority""") { (s, dir) =>
    val cust = load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = load(s, dir, "orders").filter(col("o_orderdate") < "1995-03-15")
    val li = load(s, dir, "lineitem").filter(col("l_shipdate") > "1995-03-15")
    cust.join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  // Q5 shape: local supplier volume — 6-way join through two dimension
  // chains, small dims broadcast
  q("q5_local_supplier",
    """SELECT n_name,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE), 4) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""") { (s, dir) =>
    val t = load(s, dir, "customer")
      .join(load(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(load(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
    t.groupBy("n_name")
      .agg(r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
  }

  // Q10 shape: returned items — join + filter + top-N by aggregated value
  q("q10_returned_items",
    """WITH agg AS (
      |  SELECT c_custkey, c_name,
      |    round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE), 4) AS revenue,
      |    round(c_acctbal, 4) AS c_acctbal
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |  GROUP BY c_custkey, c_name, c_acctbal)
      |SELECT * FROM agg
      |QUALIFY row_number() OVER (ORDER BY revenue DESC, c_custkey) <= 20""") { (s, dir) =>
    val t = load(s, dir, "customer")
      .join(load(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(load(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"), r4(col("c_acctbal")).as("c_acctbal"))
      .agg(r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
    // global top-N via orderBy+limit → TakeOrderedAndProject (per-partition
    // top-20 + driver merge), not a single-partition row_number window
    t.orderBy(col("revenue").desc, col("c_custkey").asc).limit(20)
      .select("c_custkey", "c_name", "revenue", "c_acctbal")
  }

  // Q18 shape: large-volume customers — groupBy-HAVING on the fact
  // table feeds a semi-join (the having set is small → broadcast), then
  // re-aggregation and a TakeOrderedAndProject top-N
  q("q18_large_volume",
    """WITH big AS (SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      |SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS DATE) AS o_orderdate,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE), 4) AS total_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
      |ORDER BY total_qty DESC, o_orderkey LIMIT 100""") { (s, dir) =>
    val li = load(s, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("_q")).filter(col("_q") > 150)
      .select(col("l_orderkey"))
    val joined = load(s, dir, "customer")
      .join(load(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(big, Seq("l_orderkey"), "left_semi")
    joined.groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(r4(dsum(col("l_quantity"))).as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc).limit(100)
  }

  // salted fact-to-dim join at lineitem scale, through an aggregation:
  // the salting rewrite must be row-identical to the plain join the
  // oracle computes (complements q_join_salted, which checks the bare
  // projection on the orders/customer pair)
  q("q_join_salted_agg",
    """SELECT o_orderpriority,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE), 4) AS revenue,
      |  count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""") { (s, dir) =>
    val li = table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
    val ord = table(s, dir, "orders", "o_orderkey")
      .renameColumns("o_orderkey" -> "l_orderkey")
    li.joinSalted(ord, Seq("l_orderkey"), buckets = 4).df
      .groupBy(col("o_orderpriority"))
      .agg(r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n"))
  }
}
