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

  // Deterministic louvain (reference: louvain_communities/impl.py:225):
  // customer→nation-hub→region-hub tree, 3 synchronous local-moving
  // rounds. All modularity-gain comparisons are 2m-scaled BIGINT
  // arithmetic — no float division — so the oracle replays the exact
  // evolution as an unrolled 3-round recurrence.
  q("q_louvain",
    """WITH e0 AS (SELECT CAST(c_custkey AS BIGINT) AS src,
      |    CAST(1000000 + c_nationkey AS BIGINT) AS dst FROM customer
      |  UNION ALL SELECT CAST(1000000 + n_nationkey AS BIGINT),
      |    CAST(2000000 + n_regionkey AS BIGINT) FROM nation),
      |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      |  FROM e GROUP BY 1),
      |mm AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM e),
      |l0 AS (SELECT node, node AS comm FROM deg),
      |t1 AS (SELECT l.comm, CAST(sum(d.deg) AS BIGINT) AS tot
      |  FROM l0 l JOIN deg d USING (node) GROUP BY 1),
      |k1 AS (SELECT e.src AS node, l.comm, CAST(count(*) AS BIGINT) AS k
      |  FROM e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2),
      |c1 AS (SELECT node, comm, max(k) AS k FROM (
      |  SELECT node, comm, k FROM k1
      |  UNION ALL SELECT node, comm, CAST(0 AS BIGINT) FROM l0) GROUP BY 1, 2),
      |s1 AS (SELECT c.node, c.comm,
      |    c.k * mm.m2 - d.deg *
      |      (CASE WHEN c.comm = o.comm THEN t.tot - d.deg ELSE t.tot END) AS score
      |  FROM c1 c JOIN deg d ON d.node = c.node JOIN l0 o ON o.node = c.node
      |  JOIN t1 t ON t.comm = c.comm CROSS JOIN mm),
      |l1 AS (SELECT node, comm FROM s1
      |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY score DESC, comm) = 1),
      |t2 AS (SELECT l.comm, CAST(sum(d.deg) AS BIGINT) AS tot
      |  FROM l1 l JOIN deg d USING (node) GROUP BY 1),
      |k2 AS (SELECT e.src AS node, l.comm, CAST(count(*) AS BIGINT) AS k
      |  FROM e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2),
      |c2 AS (SELECT node, comm, max(k) AS k FROM (
      |  SELECT node, comm, k FROM k2
      |  UNION ALL SELECT node, comm, CAST(0 AS BIGINT) FROM l1) GROUP BY 1, 2),
      |s2 AS (SELECT c.node, c.comm,
      |    c.k * mm.m2 - d.deg *
      |      (CASE WHEN c.comm = o.comm THEN t.tot - d.deg ELSE t.tot END) AS score
      |  FROM c2 c JOIN deg d ON d.node = c.node JOIN l1 o ON o.node = c.node
      |  JOIN t2 t ON t.comm = c.comm CROSS JOIN mm),
      |l2 AS (SELECT node, comm FROM s2
      |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY score DESC, comm) = 1),
      |t3 AS (SELECT l.comm, CAST(sum(d.deg) AS BIGINT) AS tot
      |  FROM l2 l JOIN deg d USING (node) GROUP BY 1),
      |k3 AS (SELECT e.src AS node, l.comm, CAST(count(*) AS BIGINT) AS k
      |  FROM e JOIN l2 l ON l.node = e.dst GROUP BY 1, 2),
      |c3 AS (SELECT node, comm, max(k) AS k FROM (
      |  SELECT node, comm, k FROM k3
      |  UNION ALL SELECT node, comm, CAST(0 AS BIGINT) FROM l2) GROUP BY 1, 2),
      |s3 AS (SELECT c.node, c.comm,
      |    c.k * mm.m2 - d.deg *
      |      (CASE WHEN c.comm = o.comm THEN t.tot - d.deg ELSE t.tot END) AS score
      |  FROM c3 c JOIN deg d ON d.node = c.node JOIN l2 o ON o.node = c.node
      |  JOIN t3 t ON t.comm = c.comm CROSS JOIN mm),
      |l3 AS (SELECT node, comm FROM s3
      |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY score DESC, comm) = 1)
      |SELECT node, comm FROM l3""") { (s, dir) =>
    val c = load(s, dir, "customer")
    val n = load(s, dir, "nation")
    val edges = c.select(col("c_custkey").cast("long").as("src"),
        (col("c_nationkey").cast("long") + 1000000L).as("dst"))
      .unionByName(n.select(
        (col("n_nationkey").cast("long") + 1000000L).as("src"),
        (col("n_regionkey").cast("long") + 2000000L).as("dst")))
    Graphs.louvain(edges, rounds = 3)
  }

  // Viterbi HMM decode (reference: stdlib/ml/hmm.py:11
  // create_hmm_reducer): each user's first 5 events (by event_id)
  // decoded against a sticky 2-state activity model — active favors
  // click/purchase, idle favors view/error, staying costs 1 bit less
  // than switching. Every log-prob is an integer-valued double, so DP
  // sums are EXACT on both engines; the oracle replays the identical
  // recurrence as an unrolled 5-step DP with the same
  // smallest-state-name tie-breaks, so paths agree bit-for-bit. The
  // 'signup' observation emits equally from both states — ties flow
  // through the tie-break rules, which is the point.
  q("q_hmm",
    """WITH seq0 AS (SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS t
      |  FROM events),
      |seq AS (SELECT * FROM seq0 WHERE t <= 5),
      |em AS (SELECT user_id, t, event_type,
      |  CASE WHEN event_type IN ('click','purchase') THEN -1.0 ELSE -3.0 END AS ea,
      |  CASE WHEN event_type IN ('view','error') THEN -1.0 ELSE -3.0 END AS ei
      |  FROM seq),
      |d1 AS (SELECT user_id, 'active' AS st, -1.0 + ea AS lp, 'active' AS path
      |    FROM em WHERE t = 1
      |  UNION ALL
      |  SELECT user_id, 'idle', -1.0 + ei, 'idle' FROM em WHERE t = 1),
      |c2 AS (SELECT d.user_id, s.st AS st, d.st AS pst, d.path,
      |    d.lp + (CASE WHEN d.st = s.st THEN -1.0 ELSE -2.0 END) AS plp
      |  FROM d1 d CROSS JOIN (SELECT unnest(['active','idle']) AS st) s),
      |b2 AS (SELECT user_id, st, plp, path FROM c2
      |  QUALIFY row_number() OVER (PARTITION BY user_id, st ORDER BY plp DESC, pst) = 1),
      |d2 AS (SELECT b.user_id, b.st,
      |    b.plp + (CASE WHEN b.st = 'active' THEN e.ea ELSE e.ei END) AS lp,
      |    b.path || ',' || b.st AS path
      |  FROM b2 b JOIN em e ON e.user_id = b.user_id AND e.t = 2),
      |c3 AS (SELECT d.user_id, s.st AS st, d.st AS pst, d.path,
      |    d.lp + (CASE WHEN d.st = s.st THEN -1.0 ELSE -2.0 END) AS plp
      |  FROM d2 d CROSS JOIN (SELECT unnest(['active','idle']) AS st) s),
      |b3 AS (SELECT user_id, st, plp, path FROM c3
      |  QUALIFY row_number() OVER (PARTITION BY user_id, st ORDER BY plp DESC, pst) = 1),
      |d3 AS (SELECT b.user_id, b.st,
      |    b.plp + (CASE WHEN b.st = 'active' THEN e.ea ELSE e.ei END) AS lp,
      |    b.path || ',' || b.st AS path
      |  FROM b3 b JOIN em e ON e.user_id = b.user_id AND e.t = 3),
      |c4 AS (SELECT d.user_id, s.st AS st, d.st AS pst, d.path,
      |    d.lp + (CASE WHEN d.st = s.st THEN -1.0 ELSE -2.0 END) AS plp
      |  FROM d3 d CROSS JOIN (SELECT unnest(['active','idle']) AS st) s),
      |b4 AS (SELECT user_id, st, plp, path FROM c4
      |  QUALIFY row_number() OVER (PARTITION BY user_id, st ORDER BY plp DESC, pst) = 1),
      |d4 AS (SELECT b.user_id, b.st,
      |    b.plp + (CASE WHEN b.st = 'active' THEN e.ea ELSE e.ei END) AS lp,
      |    b.path || ',' || b.st AS path
      |  FROM b4 b JOIN em e ON e.user_id = b.user_id AND e.t = 4),
      |c5 AS (SELECT d.user_id, s.st AS st, d.st AS pst, d.path,
      |    d.lp + (CASE WHEN d.st = s.st THEN -1.0 ELSE -2.0 END) AS plp
      |  FROM d4 d CROSS JOIN (SELECT unnest(['active','idle']) AS st) s),
      |b5 AS (SELECT user_id, st, plp, path FROM c5
      |  QUALIFY row_number() OVER (PARTITION BY user_id, st ORDER BY plp DESC, pst) = 1),
      |d5 AS (SELECT b.user_id, b.st,
      |    b.plp + (CASE WHEN b.st = 'active' THEN e.ea ELSE e.ei END) AS lp,
      |    b.path || ',' || b.st AS path
      |  FROM b5 b JOIN em e ON e.user_id = b.user_id AND e.t = 5),
      |fin AS (SELECT user_id, 1 AS lev, st, lp, path FROM d1
      |  UNION ALL SELECT user_id, 2, st, lp, path FROM d2
      |  UNION ALL SELECT user_id, 3, st, lp, path FROM d3
      |  UNION ALL SELECT user_id, 4, st, lp, path FROM d4
      |  UNION ALL SELECT user_id, 5, st, lp, path FROM d5),
      |len AS (SELECT user_id, max(t) AS L FROM seq GROUP BY 1),
      |best AS (SELECT f.user_id, f.path FROM fin f JOIN len l
      |    ON f.user_id = l.user_id AND f.lev = l.L
      |  QUALIFY row_number() OVER (PARTITION BY f.user_id ORDER BY f.lp DESC, f.st) = 1),
      |pr AS (SELECT user_id, unnest(string_split(path, ',')) AS state,
      |    unnest(range(1, len(string_split(path, ',')) + 1)) AS t FROM best)
      |SELECT CAST(p.user_id AS BIGINT) AS instance, s.event_id AS "order",
      |  s.event_type AS observation, p.state
      |FROM pr p JOIN seq s ON s.user_id = p.user_id AND s.t = p.t""") { (s, dir) =>
    import graft.operators.Hmm
    val ev = graft.SparkEntry.loadEvents(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val first5 = ev.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 5).drop("_rn")
    val model = Hmm.Model(
      states = Seq("active", "idle"),
      logInit = Map("active" -> -1.0, "idle" -> -1.0),
      logTrans = Map(
        ("active", "active") -> -1.0, ("active", "idle") -> -2.0,
        ("idle", "idle") -> -1.0, ("idle", "active") -> -2.0),
      logEmit = (st, o) =>
        if (st == "active") { if (o == "click" || o == "purchase") -1.0 else -3.0 }
        else { if (o == "view" || o == "error") -1.0 else -3.0 })
    Hmm.viterbi(first5, col("user_id"), col("event_id"), col("event_type"), model)
      .select(col("instance").cast("long").as("instance"), col("order"),
        col("observation"), col("state"))
  }

  // per-node triangle counts + local clustering coefficient over the
  // co-purchase graph (parts sharing an order — sparse and it STAYS sparse as part count scales with the corpus, unlike the near-complete co-supplier graph). The implementation
  // is DEGREE-ORIENTED compact-forward — wedge join bounded O(m^1.5),
  // no hub-degree² blowup — but any correct enumeration yields the same
  // per-node counts, so the oracle's simple a<b<c three-way join is a
  // valid independent derivation.
  q("q_triangles",
    """WITH e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |deg AS (SELECT n, count(*) AS degree FROM
      |  (SELECT a AS n FROM e0 UNION ALL SELECT b AS n FROM e0) GROUP BY 1),
      |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b
      |  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
      |pn AS (SELECT n, count(*) AS triangles FROM
      |  (SELECT x AS n FROM tri UNION ALL SELECT y AS n FROM tri
      |   UNION ALL SELECT z AS n FROM tri) GROUP BY 1)
      |SELECT deg.n AS node, deg.degree,
      |  CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles,
      |  round(CASE WHEN deg.degree < 2 THEN 0.0
      |    ELSE coalesce(pn.triangles, 0) * 2.0
      |      / (deg.degree * (deg.degree - 1)) END + 1e-9, 4) AS coeff
      |FROM deg LEFT JOIN pn ON pn.n = deg.n""") { (s, dir) =>
    val li = load(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.join(li.withColumnRenamed("l_partkey", "p2"), "l_orderkey")
      .filter(col("l_partkey") < col("p2"))
      .select(col("l_partkey").as("src"), col("p2").as("dst"))
    Graphs.triangleCounts(pairs)
      .select(col("node"), col("degree"), col("triangles"),
        round(col("coeff") + lit(1e-9), 4).as("coeff"))
  }
}
