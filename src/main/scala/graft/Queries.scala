package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Table
import graft.agg.reducers
import graft.functions._
import graft.SparkEntry.{load, loadEvents, table}

/** The driver-checked query inventory. Every query name maps 1:1 to a
  * SURVEY.md §2 operator; the companion oracle SQL (DuckDB dialect) is in
  * [[oracles]]. Floating-point aggregates are rounded to 4 decimals on
  * BOTH sides so partial-aggregation order can't flip the hash; event
  * timestamps (nanosecond parquet) are truncated to milliseconds on both
  * sides because Spark reads ns as µs.
  */
/** A named batch of driver-checked queries. Each implementing object
  * registers `name -> query` plus the DuckDB oracle SQL at init time;
  * [[SparkEntry]] concatenates the modules. */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame

  val all = scala.collection.mutable.LinkedHashMap[String, Q]()
  val oracles = scala.collection.mutable.LinkedHashMap[String, String]()

  protected def q(name: String, oracle: String = null)(fn: Q): Unit = {
    all(name) = fn
    if (oracle != null) oracles(name) = oracle.stripMargin
  }

  protected def r4(c: Column): Column = round(c, 4)

  /** Order-independent double sum: per-row cast to decimal (exact, both
    * engines round the same double), exact decimal addition, cast back.
    * Plain `round(sum(double),4)` is a trap: the data has 2-decimal
    * values, so sums land exactly on .xxx5 rounding boundaries where
    * Spark's partial-agg order and DuckDB's sequential order disagree in
    * the last ulp and round opposite ways. Oracle-side equivalent:
    * `CAST(sum(CAST(x AS DECIMAL(24,6))) AS DOUBLE)`. */
  protected def dsum(c: Column): Column =
    sum(c.cast("decimal(24,6)")).cast("double")

  /** Order-independent avg — exact decimal sum, then one double divide of
    * bit-identical operands on both sides. The +1e-9 nudge matters: avgs
    * of 2-decimal data over small groups land EXACTLY on .00005 rounding
    * boundaries, where Spark's round (exact BigDecimal HALF_UP) and
    * DuckDB's round (scaled-double) disagree. Oracle-side equivalent adds
    * the same epsilon. */
  protected def davg(c: Column): Column = dsum(c) / count(c) + lit(1e-9)

  /** Canonical cross-engine string form of an integer array: elements cast
    * to string, comma-joined. The driver's pandas comparator cannot
    * sort/hash array cells, so list-valued results are emitted as strings.
    * Oracle-side equivalent: `array_to_string(xs, ',')`. */
  protected def intJoin(arr: Column): Column =
    concat_ws(",", transform(arr, x => x.cast("string")))

  /** Canonical cross-engine string form of a numeric array: each element
    * cast to DECIMAL(18,4) — both engines print fixed-point with trailing
    * zeros ("25.5000"), never exponent notation — then comma-joined.
    * Oracle-side equivalent:
    * `array_to_string(list_transform(xs, x -> CAST(CAST(x AS DECIMAL(18,4)) AS VARCHAR)), ',')`. */
  protected def decJoin(arr: Column): Column =
    concat_ws(",", transform(arr, x => x.cast("decimal(18,4)").cast("string")))
}

object Queries extends QueryModule {

  // =====================================================================
  // §2.1 groupby/reduce — flagship (TPC-H Q1 shape, SURVEY §7.2)
  // =====================================================================
  q("q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / count(l_quantity) + 1e-9, 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) / count(l_discount) + 1e-9, 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_returnflag"), col("l_linestatus"))
      .reduce(
        "sum_qty" -> r4(dsum(col("l_quantity"))),
        "sum_base_price" -> r4(dsum(col("l_extendedprice"))),
        "sum_disc_price" -> r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))),
        "avg_qty" -> r4(davg(col("l_quantity"))),
        "avg_disc" -> r4(davg(col("l_discount"))),
        "count_order" -> reducers.rcount())
  }

  // =====================================================================
  // §2.1 row-wise relational
  // =====================================================================

  // select(*args) — projection with expressions (table.py:382)
  q("q_select",
    """SELECT p_partkey, upper(p_brand) AS brand_u,
      |  p_size * 2 AS dsize FROM part""") { (s, dir) =>
    table(s, dir, "part", "p_partkey")
      .select("brand_u" -> upper(col("p_brand")), "dsize" -> col("p_size") * 2)
      .df
  }

  // filter(expr) (table.py:490)
  q("q_filter",
    """SELECT c_custkey, c_name, round(c_acctbal, 4) AS bal FROM customer
      |WHERE c_acctbal > 1000 AND c_mktsegment = 'BUILDING'""") { (s, dir) =>
    table(s, dir, "customer", "c_custkey")
      .filter(col("c_acctbal") > 1000 && col("c_mktsegment") === "BUILDING")
      .select("c_name" -> col("c_name"), "bal" -> r4(col("c_acctbal")))
      .df
  }

  // with_columns (table.py:1613)
  q("q_with_columns",
    """SELECT o_orderkey, o_totalprice, CAST(floor(o_totalprice / 10000) AS BIGINT)
      |  AS price_bucket, year(o_orderdate) AS o_year FROM orders""") { (s, dir) =>
    table(s, dir, "orders", "o_orderkey")
      .withColumns(
        "price_bucket" -> floor(col("o_totalprice") / 10000).cast("long"),
        "o_year" -> year(col("o_orderdate")))
      .select("o_totalprice" -> col("o_totalprice"),
        "price_bucket" -> col("price_bucket"), "o_year" -> col("o_year"))
      .df
  }

  // rename_columns + without (table.py:1763, :1921)
  q("q_rename_without",
    """SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
      |FROM customer""") { (s, dir) =>
    table(s, dir, "customer", "c_custkey")
      .without("c_acctbal", "c_nationkey")
      .renameColumns("c_custkey" -> "custkey", "c_name" -> "name",
        "c_mktsegment" -> "segment")
      .df
  }

  // split(expr) — both halves, tagged (table.py:531)
  q("q_split",
    """SELECT o_orderkey, o_orderstatus, (o_totalprice > 100000) AS is_big
      |FROM orders""") { (s, dir) =>
    val t = table(s, dir, "orders", "o_orderkey")
      .select("o_orderstatus" -> col("o_orderstatus"),
        "o_totalprice" -> col("o_totalprice"))
    val (big, small) = t.split(col("o_totalprice") > 100000)
    big.withColumns("is_big" -> lit(true))
      .concat(small.withColumns("is_big" -> lit(false)))
      .without("o_totalprice").df
  }

  // concat — keyed union with disjointness check (table.py:1334)
  q("q_concat",
    """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS price
      |FROM orders""") { (s, dir) =>
    val t = table(s, dir, "orders", "o_orderkey")
      .select("o_orderstatus" -> col("o_orderstatus"),
        "price" -> r4(col("o_totalprice")))
    val (f, rest) = t.split(col("o_orderstatus") === "F")
    f.concat(rest).df
  }

  // concat_reindex (table.py:308) — union of OVERLAPPING key sets under
  // a fresh composite key (checked concat would raise on the overlap;
  // reindex makes the union legal, as the reference's fresh-id concat)
  q("q_concat_reindex",
    """SELECT o_orderpriority, count(*) AS n FROM (
      |  SELECT o_orderpriority FROM orders WHERE o_orderkey % 3 < 2
      |  UNION ALL
      |  SELECT o_orderpriority FROM orders WHERE o_orderkey % 3 > 0)
      |GROUP BY o_orderpriority""") { (s, dir) =>
    val o = load(s, dir, "orders")
    val a = Table.fromDF(o.filter(col("o_orderkey") % 3 < 2)
      .withColumn("_src", lit(0)), Seq("o_orderkey"))
    val b = Table.fromDF(o.filter(col("o_orderkey") % 3 > 0)
      .withColumn("_src", lit(1)), Seq("o_orderkey"))
    a.concatReindex(Seq("_src", "o_orderkey"), b).df
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
  }

  // with_universe_of (universe_solver.py:14) — the CHECKED universe
  // equality on the pass path: same key set on both sides, so the
  // full-outer check passes and the result is the table itself (the
  // raise path is proven in TableSpec, not SQL-expressible)
  q("q_with_universe_of",
    """SELECT o_orderkey, o_orderstatus FROM orders""") { (s, dir) =>
    val o = table(s, dir, "orders", "o_orderkey")
    val priorities = table(s, dir, "orders", "o_orderkey")
      .select("pri" -> col("o_orderpriority"))
    o.withUniverseOf(priorities)
      .select("o_orderstatus" -> col("o_orderstatus")).df
  }

  // intersect (table.py:776) — customers that have orders
  q("q_intersect",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)""") { (s, dir) =>
    val cust = table(s, dir, "customer", "c_custkey")
    val withOrders = Table.fromDF(
      load(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
      Seq("c_custkey"))
    cust.intersect(withOrders).select("c_name" -> col("c_name")).df
  }

  // difference (table.py:739) — customers without orders
  q("q_difference",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""") { (s, dir) =>
    val cust = table(s, dir, "customer", "c_custkey")
    val withOrders = Table.fromDF(
      load(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
      Seq("c_custkey"))
    cust.difference(withOrders).select("c_name" -> col("c_name")).df
  }

  // restrict / having (table.py:837, :2027) — lineitems of urgent orders
  q("q_restrict",
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
      |FROM lineitem WHERE l_orderkey IN
      |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""") { (s, dir) =>
    val li = table(s, dir, "lineitem", "l_orderkey")
    val urgent = Table.fromDF(
      load(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"))
    li.having(urgent)
      .select("l_linenumber" -> col("l_linenumber"),
        "price" -> r4(col("l_extendedprice")))
      .df
  }

  // update_cells (table.py:1439) — zero balances of BUILDING customers
  q("q_update_cells",
    """SELECT c_custkey,
      |  round(CASE WHEN c_mktsegment = 'BUILDING' THEN 0.0 ELSE c_acctbal END, 4)
      |    AS c_acctbal
      |FROM customer""") { (s, dir) =>
    val cust = table(s, dir, "customer", "c_custkey")
      .select("c_acctbal" -> col("c_acctbal"),
        "c_mktsegment" -> col("c_mktsegment"))
    val patch = cust.filter(col("c_mktsegment") === "BUILDING")
      .select("c_acctbal" -> lit(0.0))
    cust.updateCells(patch)
      .select("c_acctbal" -> r4(col("c_acctbal"))).df
  }

  // update_rows (table.py:1524) — upsert doubled-price F orders
  q("q_update_rows",
    """SELECT o_orderkey,
      |  round(CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
      |             ELSE o_totalprice END, 4) AS price
      |FROM orders""") { (s, dir) =>
    val o = table(s, dir, "orders", "o_orderkey")
      .select("price" -> r4(col("o_totalprice")),
        "status" -> col("o_orderstatus"))
    val patched = o.filter(col("status") === "F")
      .withColumns("price" -> r4(col("price") * 2))
    o.updateRows(patched).without("status").df
  }

  // with_id_from / pointer_from (table.py:1690, :2371) — stable row hash
  q("q_pointer_from",
    """SELECT o_orderkey,
      |  md5(to_json(struct_pack(o_orderkey := o_orderkey))) AS ptr_hex
      |FROM orders""") { (s, dir) =>
    table(s, dir, "orders", "o_orderkey")
      .select("ptr_hex" -> lower(hex(pointer_from(col("o_orderkey")))))
      .df
  }

  // ix — dictionary lookup by key (table.py:1164)
  q("q_ix",
    """SELECT k.o_custkey AS c_custkey, k.n_orders, c.c_name
      |FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) k
      |JOIN customer c ON c.c_custkey = k.o_custkey""") { (s, dir) =>
    val cust = table(s, dir, "customer", "c_custkey")
    val keys = Table.fromDF(
      load(s, dir, "orders").groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders")),
      Seq("c_custkey"))
    cust.ix(keys).select("n_orders" -> col("n_orders"), "c_name" -> col("c_name")).df
  }

  // flatten — explode array column (table.py:2089)
  q("q_flatten",
    """SELECT p_partkey,
      |  unnest(range(len(string_split(p_name, ' ')))) AS _origin_pos,
      |  unnest(string_split(p_name, ' ')) AS word
      |FROM part""") { (s, dir) =>
    table(s, dir, "part", "p_partkey")
      .select("word" -> split(col("p_name"), " "))
      .flatten("word")
      .df.select("p_partkey", "_origin_pos", "word")
  }

  // cast_to_types (table.py:2011)
  q("q_cast",
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty_int,
      |  CAST(l_shipdate AS DATE) AS ship_day FROM lineitem""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .select("qty_int" -> col("l_quantity").cast("long"),
        "ship_day" -> col("l_shipdate").cast("date"))
      .df
  }

  // =====================================================================
  // §2.2 reducers
  // =====================================================================

  q("q_reduce_minmax",
    """SELECT l_returnflag, min(l_shipdate) AS first_ship,
      |  max(l_shipdate) AS last_ship, round(min(l_extendedprice), 4) AS min_price,
      |  round(max(l_extendedprice), 4) AS max_price
      |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_returnflag"))
      .reduce(
        "first_ship" -> reducers.rmin(col("l_shipdate")),
        "last_ship" -> reducers.rmax(col("l_shipdate")),
        "min_price" -> r4(reducers.rmin(col("l_extendedprice"))),
        "max_price" -> r4(reducers.rmax(col("l_extendedprice"))))
  }

  // exact interpolated percentiles (quantile_cont parity: index p·(n−1),
  // linear interpolation — same definition both engines; +1e-9 nudge
  // absorbs last-ulp interpolation-order differences at round boundaries)
  q("q_reduce_percentile",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5) + 1e-9, 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95) + 1e-9, 4) AS p95
      |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_returnflag"))
      .reduce(
        "p50" -> r4(reducers.rmedian(col("l_extendedprice")) + lit(1e-9)),
        "p95" -> r4(reducers.rpercentile(col("l_extendedprice"), 0.95) + lit(1e-9)))
  }

  // exact-sum second-moment statistics: every sum is taken in decimal
  // (order-free), the moment formula is a handful of double ops on
  // bit-identical operands — deterministic on any engine/partitioning,
  // unlike the built-in stddev/var/corr whose double partial-agg order
  // flips the last ulp run to run
  q("q_reduce_stats",
    """WITH m AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sx,
      |  CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sxx
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |  round((n * sxx - sx * sx) / (n * (n - 1)) + 1e-9, 4) AS var_price,
      |  round(sqrt((n * sxx - sx * sx) / (n * (n - 1))) + 1e-9, 4) AS sd_price
      |FROM m""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_returnflag"))
      .reduce(
        "var_price" -> r4(reducers.rvarSamp(col("l_extendedprice")) + lit(1e-9)),
        "sd_price" -> r4(reducers.rstddevSamp(col("l_extendedprice")) + lit(1e-9)))
  }

  q("q_reduce_corr",
    """WITH m AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sx,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sy,
      |  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
      |  CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS syy,
      |  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |  round((n * sxy - sx * sy) / sqrt(n * sxx - sx * sx)
      |    / sqrt(n * syy - sy * sy) + 1e-9, 4) AS corr_qp,
      |  round((n * sxy - sx * sy) / (n * (n - 1)) + 1e-9, 4) AS covar_qp
      |FROM m""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_returnflag"))
      .reduce(
        "corr_qp" -> r4(reducers.rcorr(col("l_quantity"), col("l_extendedprice")) + lit(1e-9)),
        "covar_qp" -> r4(reducers.rcovarSamp(col("l_quantity"), col("l_extendedprice")) + lit(1e-9)))
  }

  // deterministic mode (most frequent value, smallest on ties — both
  // engines' built-in mode is tie-undefined): two map-side-combinable
  // aggregations, the first collapsing to (key, distinct-value) rows
  q("q_reduce_mode",
    """WITH c AS (SELECT l_returnflag, l_quantity AS v, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, v, row_number() OVER (
      |    PARTITION BY l_returnflag ORDER BY cnt DESC, v ASC) AS rn FROM c)
      |SELECT l_returnflag, v AS mode_qty FROM r WHERE rn = 1""") { (s, dir) =>
    val counted = table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_returnflag"), col("l_quantity"))
      .reduce("cnt" -> reducers.rcount())
    Table.fromDF(counted, Seq("l_returnflag"))
      .groupby(col("l_returnflag"))
      .reduce("mode_qty" -> reducers.modeOfCounted(col("l_quantity"), col("cnt")))
  }

  // hierarchical subtotals (ANSI ROLLUP): detail → per-flag → grand
  // total in ONE aggregation — Spark plans a single Expand feeding one
  // hash agg (levels+1 layers, one shuffle), not a per-level rescan.
  // grouping_id disambiguates aggregated-away NULLs from data NULLs;
  // both engines use the same bitmask (first listed column = MSB)
  q("q_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  grouping_id(l_returnflag, l_linestatus) AS gid, count(*) AS n,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupbyRollup(col("l_returnflag"), col("l_linestatus"))
      .reduce("gid" -> grouping_id().cast("long"),
        "n" -> reducers.rcount(),
        "sum_qty" -> r4(dsum(col("l_quantity"))))
  }

  // every-subset subtotals (ANSI CUBE) — same single-Expand plan, 2^k
  // layers
  q("q_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |  grouping_id(o_orderstatus, o_orderpriority) AS gid, count(*) AS n,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE), 4) AS rev
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""") { (s, dir) =>
    table(s, dir, "orders", "o_orderkey")
      .groupbyCube(col("o_orderstatus"), col("o_orderpriority"))
      .reduce("gid" -> grouping_id().cast("long"),
        "n" -> reducers.rcount(),
        "rev" -> r4(dsum(col("o_totalprice"))))
  }

  // explicit grouping-set list — two independent one-column summaries in
  // one pass over the input
  q("q_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  grouping_id(l_returnflag, l_linestatus) AS gid, count(*) AS n
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupbyGroupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .reduce("gid" -> grouping_id().cast("long"),
        "n" -> reducers.rcount())
  }

  // long→wide pivot with an EXPLICIT value list: schema stays static
  // (no distinct-discovery job) and the plan is one ordinary hash
  // aggregate with a conditional branch per value — the same single
  // shuffle as the groupby
  q("q_pivot",
    """SELECT l_linestatus,
      |  round(CAST(sum(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity END
      |    AS DECIMAL(24,6))) AS DOUBLE), 4) AS A,
      |  round(CAST(sum(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity END
      |    AS DECIMAL(24,6))) AS DOUBLE), 4) AS N,
      |  round(CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity END
      |    AS DECIMAL(24,6))) AS DOUBLE), 4) AS R
      |FROM lineitem GROUP BY l_linestatus""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .pivot(Seq(col("l_linestatus")), col("l_returnflag"),
        Seq("A", "N", "R"), r4(dsum(col("l_quantity"))))
  }

  // wide→long unpivot: pure map-side Expand, zero shuffles
  q("q_unpivot",
    """SELECT o_orderkey, 'price' AS metric, o_totalprice AS value FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'cust' AS metric, CAST(o_custkey AS DOUBLE) AS value
      |FROM orders""") { (s, dir) =>
    table(s, dir, "orders", "o_orderkey")
      .unpivot(Seq(col("o_orderkey")),
        Seq(col("o_totalprice").as("price"),
          col("o_custkey").cast("double").as("cust")),
        "metric", "value")
  }

  // data-quality expectations (Delta CHECK / dbt-test shape): N rules =
  // ONE aggregation pass (each rule a conditional sum), report exploded
  // to one row per rule; NULL predicate counts as a violation (the SQL
  // CHECK trap, inverted deliberately)
  q("q_expectations",
    """SELECT 'qty_positive' AS rule,
      |  CAST(sum(CASE WHEN NOT coalesce(l_quantity > 0, FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |  CAST(count(*) AS BIGINT) AS n_rows FROM lineitem
      |UNION ALL
      |SELECT 'price_under_60k',
      |  CAST(sum(CASE WHEN NOT coalesce(l_extendedprice < 60000, FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(*) AS BIGINT) FROM lineitem
      |UNION ALL
      |SELECT 'flag_domain',
      |  CAST(sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(count(*) AS BIGINT) FROM lineitem""") { (s, dir) =>
    graft.core.Expect.check(
      table(s, dir, "lineitem", "l_orderkey", "l_linenumber").df,
      Seq(
        "qty_positive" -> (col("l_quantity") > 0),
        "price_under_60k" -> (col("l_extendedprice") < 60000),
        "flag_domain" -> col("l_returnflag").isin("A", "N", "R")))
  }

  q("q_reduce_global",
    """SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE), 4) AS revenue,
      |  count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS key_sum
      |FROM lineitem""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .reduce(
        "revenue" -> r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))),
        "n" -> reducers.rcount(),
        "key_sum" -> reducers.rsum(col("l_orderkey")))
  }

  // argmin/argmax → row key of extremal row (reducers.py:360/:393)
  q("q_reduce_argminmax",
    """WITH w AS (SELECT l_returnflag, l_orderkey,
      |  row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn_a,
      |  row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn_d
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  min(CASE WHEN rn_a = 1 THEN l_orderkey END) AS first_order,
      |  min(CASE WHEN rn_d = 1 THEN l_orderkey END) AS last_order
      |FROM w GROUP BY l_returnflag""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_returnflag"))
      .reduce(
        "first_order" -> reducers.argmin(col("l_orderkey"),
          struct(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))),
        "last_order" -> reducers.argmax(col("l_orderkey"),
          struct(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))))
  }

  // unique — errors if >1 distinct value per group (reducers.py:426)
  q("q_reduce_unique",
    """SELECT n_regionkey, min(r_name) AS region_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_regionkey""") { (s, dir) =>
    table(s, dir, "nation", "n_nationkey")
      .join(Table.fromDF(load(s, dir, "region"), Seq("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .groupby(col("n_regionkey"))
      .reduce("region_name" -> reducers.runique(col("r_name")))
  }

  // any — deterministic arbitrary element (reducers.py:457)
  q("q_reduce_any",
    """SELECT c_mktsegment, min(c_name) AS a_customer
      |FROM customer GROUP BY c_mktsegment""") { (s, dir) =>
    table(s, dir, "customer", "c_custkey")
      .groupby(col("c_mktsegment"))
      .reduce("a_customer" -> reducers.rany(col("c_name")))
  }

  // sorted_tuple (reducers.py:485) — list emitted as canonical string so
  // the driver's pandas comparator can hash it.
  q("q_reduce_sorted_tuple",
    """SELECT l_orderkey,
      |  array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS lines
      |FROM lineitem GROUP BY l_orderkey""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_orderkey"))
      .reduce("lines" -> intJoin(reducers.sorted_tuple(col("l_linenumber"))))
  }

  // tuple with sort_by order (reducers.py:516) — canonical string output.
  q("q_reduce_tuple_by",
    """SELECT l_orderkey,
      |  array_to_string(list_transform(
      |    list(round(l_quantity, 4) ORDER BY l_linenumber, round(l_quantity, 4)),
      |    x -> CAST(CAST(x AS DECIMAL(18,4)) AS VARCHAR)), ',') AS qtys
      |FROM lineitem GROUP BY l_orderkey""") { (s, dir) =>
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .groupby(col("l_orderkey"))
      .reduce("qtys" -> decJoin(reducers.tuple_by(r4(col("l_quantity")), col("l_linenumber"))))
  }

  // earliest / latest by event time (reducers.py:653/:687); ns→ms truncation
  q("q_reduce_earliest_latest",
    """WITH e AS (SELECT user_id, value,
      |  date_trunc('milliseconds', ts) AS tms, event_id FROM events),
      |x AS (SELECT user_id, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY tms, event_id) AS ra,
      |  row_number() OVER (PARTITION BY user_id ORDER BY tms DESC, event_id DESC) AS rd
      |  FROM e)
      |SELECT user_id, min(CASE WHEN ra = 1 THEN value END) AS first_value,
      |  min(CASE WHEN rd = 1 THEN value END) AS last_value
      |FROM x GROUP BY user_id""") { (s, dir) =>
    val ms = date_trunc("millisecond", col("ts"))
    Table.fromDF(loadEvents(s, dir), Seq("event_id"))
      .groupby(col("user_id"))
      .reduce(
        "first_value" -> reducers.earliest(col("value"), struct(ms, col("event_id"))),
        "last_value" -> reducers.latest(col("value"), struct(ms, col("event_id"))))
  }

  // ndarray / element-wise array sum (reducers.py:618 + ArraySum) —
  // elements converted to exact fixed-point micro-units (floor(v*1e6):
  // float→double is exact, the double multiply and floor are bit-identical
  // IEEE on both engines), then integer sums — fully order-independent and
  // rounding-free; canonical string output for the pandas comparator.
  q("q_reduce_array_sum",
    """SELECT label, array_to_string(list(s ORDER BY ord), ',') AS vec_sum FROM (
      |  SELECT label, ord,
      |    CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS s
      |  FROM (
      |    SELECT label, unnest(embedding) AS v,
      |      unnest(range(len(embedding))) AS ord FROM embeddings)
      |  GROUP BY label, ord)
      |GROUP BY label""") { (s, dir) =>
    table(s, dir, "embeddings", "vec_id")
      .groupby(col("label"))
      .reduce("vec_sum" -> intJoin(
        reducers.array_sum_fixed(
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(1e6)).cast("long")), 64)))
  }

  // =====================================================================
  // §2.3 expression namespaces
  // =====================================================================

  q("q_str_ops",
    """SELECT c_custkey, lower(c_name) AS lo, upper(c_name) AS up,
      |  reverse(c_name) AS rev, length(c_name) AS len,
      |  replace(c_name, '0', 'X') AS repl, trim(c_name) AS stripped,
      |  (left(c_name, 9) = 'Customer#') AS pref,
      |  substr(c_name, 10, 3) AS sliced,
      |  TRY_CAST(substr(c_name, 10, 9) AS BIGINT) AS parsed
      |FROM customer""") { (s, dir) =>
    table(s, dir, "customer", "c_custkey").select(
      "lo" -> col("c_name").strLower,
      "up" -> col("c_name").strUpper,
      "rev" -> col("c_name").strReversed,
      "len" -> col("c_name").strLen.cast("long"),
      "repl" -> col("c_name").strReplace(lit("0"), lit("X")),
      "stripped" -> col("c_name").strStrip,
      "pref" -> col("c_name").strStartsWith(lit("Customer#")),
      "sliced" -> col("c_name").strSlice(9, 12),
      "parsed" -> substring(col("c_name"), 10, 9).parseInt).df
  }

  q("q_dt_ops",
    """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  day(o_orderdate) AS d, dayofweek(o_orderdate) + 1 AS dow,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders""") { (s, dir) =>
    table(s, dir, "orders", "o_orderkey").select(
      "y" -> col("o_orderdate").dtYear,
      "m" -> col("o_orderdate").dtMonth,
      "d" -> col("o_orderdate").dtDay,
      "dow" -> dayofweek(col("o_orderdate")).cast("long"),
      "ym" -> col("o_orderdate").dtStrftime("yyyy-MM"),
      "mon" -> col("o_orderdate").dtFloor("month"),
      "epoch_s" -> col("o_orderdate").dtTimestampSec).df
  }

  q("q_num_ops",
    """SELECT l_orderkey, l_linenumber, round(abs(l_discount - 0.05), 4) AS adev,
      |  round(l_extendedprice, 1) AS p1,
      |  round(l_quantity / nullif(l_discount, 0.0), 4) AS ratio_or_null,
      |  round(coalesce(l_quantity / nullif(l_discount, 0.0), -1.0), 4) AS filled
      |FROM lineitem""") { (s, dir) =>
    val ratio = col("l_quantity") / nullif(col("l_discount"), lit(0.0))
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber").select(
      "adev" -> r4((col("l_discount") - 0.05).numAbs),
      "p1" -> col("l_extendedprice").numRound(1),
      "ratio_or_null" -> r4(ratio),
      "filled" -> r4(ratio.numFillNa(lit(-1.0)))).df
  }

  // if_else / coalesce / require / fill_error (common.py:328/:277/:302/:438)
  q("q_ifelse_coalesce",
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'ok' END AS status,
      |  round(coalesce(CASE WHEN c_acctbal > 0 THEN c_acctbal END, 0.0), 4) AS pos_bal,
      |  round(CASE WHEN c_nationkey IS NOT NULL THEN c_acctbal END, 4) AS required_bal
      |FROM customer""") { (s, dir) =>
    table(s, dir, "customer", "c_custkey").select(
      "status" -> if_else(col("c_acctbal") < 0, lit("overdrawn"), lit("ok")),
      "pos_bal" -> r4(fill_error(when(col("c_acctbal") > 0, col("c_acctbal")), lit(0.0))),
      "required_bal" -> r4(require(col("c_acctbal"), col("c_nationkey")))).df
  }

  // .dt strptime + interval arithmetic (date_time.py:555 strptime,
  // :840 add_duration; DurationExpression arithmetic)
  q("q_dt_arith",
    """SELECT o_orderkey,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due,
      |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS TIMESTAMP)
      |    AS roundtrip,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
      |    AS days_since
      |FROM orders""") { (s, dir) =>
    table(s, dir, "orders", "o_orderkey").select(
      "due" -> (col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("timestamp"),
      "roundtrip" -> col("o_orderdate").dtStrftime("yyyy-MM-dd").dtStrptime("yyyy-MM-dd"),
      "days_since" -> datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("long")).df
  }

  // salted join — skew-resistant equi-join (scale utility; semantically
  // a plain join, which is exactly what the oracle states)
  q("q_join_salted",
    """SELECT o_orderkey, c.c_mktsegment FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey""") { (s, dir) =>
    val o = table(s, dir, "orders", "o_orderkey")
      .renameColumns("o_custkey" -> "c_custkey")
    o.joinSalted(table(s, dir, "customer", "c_custkey"), Seq("c_custkey"), 8)
      .select("c_mktsegment" -> col("c_mktsegment")).df
  }

  // bloom-pruned semi-join — scale utility: probe-side rows that cannot
  // match are dropped map-side by a codegen'd bloom probe before the
  // shuffle; false positives die in the exact join, so semantically this
  // IS the plain semi-join the oracle states
  q("q_join_bloom",
    """SELECT l_suppkey, count(*) AS n,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_qty
      |FROM lineitem
      |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
      |GROUP BY l_suppkey""") { (s, dir) =>
    val allow = table(s, dir, "supplier", "s_suppkey").df
      .filter(col("s_acctbal") > 5000)
      .select(col("s_suppkey").as("l_suppkey"))
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .joinBloomPruned(Table.fromDF(allow, Seq("l_suppkey")),
        Seq("l_suppkey"), "left_semi")
      .groupby(col("l_suppkey"))
      .reduce("n" -> reducers.rcount(),
        "sum_qty" -> r4(dsum(col("l_quantity"))))
  }

  // bloom-accelerated anti-join — the blocklist/decontamination shape:
  // rows failing the bloom are provably clean and skip the shuffle; only
  // the might-match sliver runs the exact anti join
  q("q_join_bloom_anti",
    """SELECT l_suppkey, count(*) AS n FROM lineitem
      |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
      |GROUP BY l_suppkey""") { (s, dir) =>
    val block = table(s, dir, "supplier", "s_suppkey").df
      .filter(col("s_acctbal") > 5000)
      .select(col("s_suppkey").as("l_suppkey"))
    table(s, dir, "lineitem", "l_orderkey", "l_linenumber")
      .joinBloomAnti(Table.fromDF(block, Seq("l_suppkey")), Seq("l_suppkey"))
      .groupby(col("l_suppkey"))
      .reduce("n" -> reducers.rcount())
  }

  // JSON get (JsonGetItem, expression.rs:386)
  q("q_json_get",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""") { (s, dir) =>
    Table.fromDF(loadEvents(s, dir), Seq("event_id")).select(
      "k" -> json_get(col("props"), "k").cast("long")).df
  }

  // argmax_rows (stdlib/utils/filtering.py:8) — per customer, the full
  // row of their priciest order; ties toward the smallest orderkey
  q("q_argmax_rows",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey) = 1""") { (s, dir) =>
    operators.ColUtils.argmaxRows(
      load(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      Seq(col("o_custkey")), col("o_totalprice"), col("o_orderkey"))
  }

  // unpack_col (stdlib/utils/col.py:60; previously ColUtilsSpec-only):
  // struct column back to top-level columns — a pure projection, so the
  // oracle is just the flat SELECT
  q("q_unpack_col",
    """SELECT p_partkey, p_name, p_retailprice FROM part""") { (s, dir) =>
    val packed = load(s, dir, "part").select(
      struct(col("p_partkey"), col("p_name"), col("p_retailprice")).as("packed"))
    operators.ColUtils.unpackCol(packed, col("packed"),
      "p_partkey", "p_name", "p_retailprice")
  }

  // groupby_reduce_majority (stdlib/utils/col.py:326) — each user's most
  // frequent event type; ties toward the alphabetically smallest
  q("q_majority",
    """WITH c AS (SELECT user_id, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id AS grp, event_type AS majority FROM c
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY n DESC, event_type) = 1""") { (s, dir) =>
    operators.ColUtils.majority(loadEvents(s, dir),
        col("user_id"), col("event_type"))
      .select(col("group").as("grp"), col("majority"))
  }

  // typed JSON (JsonToOptional, expression.rs:115; tests/test_json.py) —
  // typed extraction with NULL-on-absent / NULL-on-mismatch soft errors:
  // long/double/string views of props.k, a missing path, a non-numeric
  // value cast to long, and a from_json struct-schema field access
  q("q_json_typed",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
      |  round(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) / 7 + 1e-9, 4) AS k_double,
      |  json_extract_string(props, '$.k') AS k_str,
      |  TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
      |  TRY_CAST(json_extract_string('{"s": "' || event_type || '"}', '$.s') AS BIGINT) AS s_mismatch,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
      |FROM events""") { (s, dir) =>
    import org.apache.spark.sql.types._
    Table.fromDF(loadEvents(s, dir), Seq("event_id")).select(
      "k_long" -> json_typed(col("props"), "k", LongType),
      "k_double" -> r4(json_typed(col("props"), "k", DoubleType) / 7 + lit(1e-9)),
      "k_str" -> json_typed(col("props"), "k", StringType),
      "k_missing" -> json_typed(col("props"), "missing", LongType),
      "s_mismatch" -> json_typed(
        concat(lit("{\"s\": \""), col("event_type"), lit("\"}")), "s", LongType),
      "k_struct" -> json_object(col("props"),
        StructType(Seq(StructField("k", LongType)))).getField("k")).df
  }

  // remove_errors (table.py:2491) — try_-parse the numeric tail of
  // c_name, drop rows whose parse errored (soft-error → NULL convention)
  q("q_remove_errors",
    """SELECT c_custkey, TRY_CAST(substr(c_name, 10, 9) AS BIGINT) AS parsed
      |FROM customer WHERE TRY_CAST(substr(c_name, 10, 9) AS BIGINT) IS NOT NULL""") { (s, dir) =>
    table(s, dir, "customer", "c_custkey")
      .select("parsed" -> substring(col("c_name"), 10, 9).parseInt)
      .removeErrors("parsed")
      .df
  }

  // exact broadcast hash join — small dimension to every executor
  q("q_join_broadcast",
    """SELECT o_orderkey, c.c_mktsegment FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey""") { (s, dir) =>
    table(s, dir, "orders", "o_orderkey")
      .joinBroadcast(
        table(s, dir, "customer", "c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment" -> col("c_mktsegment"))
      .df
  }

  // gradual_broadcast (table.py:631, gradual_broadcast.rs threshold walk):
  // triplet = (0, #open orders, #orders) — exact integer counts, so both
  // engines derive a bit-identical double threshold; each customer's md5
  // key-fraction picks upper or lower. No join, no shuffle: one broadcast
  // row folded into a projection.
  q("q_gradual_broadcast",
    """WITH t AS (SELECT CAST(0 AS DOUBLE) AS lo,
      |    CAST((SELECT count(*) FROM orders WHERE o_orderstatus = 'O') AS DOUBLE) AS va,
      |    CAST((SELECT count(*) FROM orders) AS DOUBLE) AS up)
      |SELECT c_custkey,
      |  CASE WHEN CAST('0x' || substr(md5('gb' || CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT)
      |        < CAST(floor((va - lo) / (up - lo) * 4294967296.0) AS BIGINT)
      |       THEN up ELSE lo END AS apx_value
      |FROM customer, t""") { (s, dir) =>
    val o = load(s, dir, "orders")
    val t = o.agg(
      lit(0.0).as("lo"),
      count(when(col("o_orderstatus") === "O", 1)).cast("double").as("va"),
      count(lit(1)).cast("double").as("up"))
    table(s, dir, "customer", "c_custkey")
      .gradualBroadcast(t, col("lo"), col("va"), col("up"))
      .df.select(col("c_custkey"), col("apx_value"))
  }

  // retraction-aware reduction (custom_reducers.py:174 retract): a diff
  // stream derived from orders — every row inserted, %5==0 keys later
  // retracted — folded in ONE ordinary aggregate (retractions as
  // negative contributions; decimal-exact product so both engines sum
  // identically). The oracle replays the same delta algebra directly.
  q("q_retract_reduce",
    """WITH d AS (
      |  SELECT o_orderpriority, o_totalprice, 1 AS diff FROM orders
      |  UNION ALL
      |  SELECT o_orderpriority, o_totalprice, -1 FROM orders
      |  WHERE o_orderkey % 5 = 0)
      |SELECT o_orderpriority,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(24,6))
      |    * CAST(diff AS DECIMAL(2,0))) AS DOUBLE), 4) AS s,
      |  CAST(sum(diff) AS BIGINT) AS n
      |FROM d GROUP BY 1""") { (s, dir) =>
    val o = load(s, dir, "orders")
    val d = o.select(col("o_orderpriority"), col("o_totalprice"), lit(1L).as("diff"))
      .unionByName(o.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderpriority"), col("o_totalprice"), lit(-1L).as("diff")))
    d.groupBy("o_orderpriority").agg(
      r4(reducers.retractSum(col("o_totalprice").cast("decimal(24,6)"),
        col("diff").cast("decimal(2,0)")).cast("double")).as("s"),
      reducers.retractCount(col("diff")).cast("long").as("n"))
  }

  // make_tuple + get (common.py:361, expression.py:994) — struct emitted
  // as compact JSON (identical `{"k":v}` form in both engines) so the
  // driver's pandas comparator can hash it.
  q("q_make_tuple",
    """SELECT n_nationkey,
      |  to_json(struct_pack(key := n_nationkey, name := n_name)) AS tup,
      |  string_split(n_name, 'I')[1] AS first_piece
      |FROM nation""") { (s, dir) =>
    table(s, dir, "nation", "n_nationkey").select(
      "tup" -> to_json(make_tuple(col("n_nationkey").as("key"), col("n_name").as("name"))),
      "first_piece" -> get_or(split(col("n_name"), "I"), 0, lit(""))).df
  }
}
