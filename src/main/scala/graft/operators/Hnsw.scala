package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioned HNSW ANN (reference:
  * src/external_integration/usearch_integration.rs — the reference
  * links the USearch HNSW library; stdlib/indexing/nearest_neighbors.py:65
  * exposes it as an index choice). Spark-first shape: ONE HNSW graph per
  * partition built inside `mapPartitions` (the index is worker-local
  * state, exactly like the reference's per-worker USearch instances),
  * queries broadcast to every partition, per-partition top-k merged by a
  * global rank window. That is the standard sharded-ANN serving layout:
  * build is embarrassingly parallel, search cost is
  * |queries| × partitions × log(partition size).
  *
  * The graph itself is the textbook Malkov–Yashunin structure
  * (hierarchical layers, greedy descent above layer 0, best-first beam
  * at layer 0) with every source of randomness made deterministic:
  *
  *  - level assignment: u ∈ (0,1) derived from md5(id) instead of a
  *    RNG, so the layer structure is a pure function of the ids;
  *  - all priority orders tie-break on (distance, id) — rebuilds and
  *    engines agree bit-for-bit.
  *
  * Exactness dial (mirrors IVF's nprobe=nlist): when `efSearch` ≥ the
  * partition's row count AND `m` keeps the layer-0 graph connected
  * (m ≥ n links everything), the beam can never fill, best-first
  * degenerates to full traversal of the connected component, and the
  * result is EXACTLY the brute-force top-k — that is the configuration
  * the oracle checks; approximate configurations are spec-checked by
  * recall against brute force.
  */
object Hnsw {

  /** Worker-local HNSW over (id, vector, norm²) rows; cosine metric.
    * `private[graft]` so HnswSpec can unit-test beam-edge cases the
    * sharded path can't pin (partitioning spreads the corpus). */
  private[graft] final class PartIndex(m: Int, efConstruction: Int) {
    private val ids = mutable.ArrayBuffer[Long]()
    private val vecs = mutable.ArrayBuffer[Array[Double]]()
    private val norms = mutable.ArrayBuffer[Double]()
    private val levels = mutable.ArrayBuffer[Int]()
    // links(node)(level) = neighbor node indexes
    private val links = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
    private var entry = -1
    private var maxLevel = -1
    private val mL = 1.0 / math.log(m.toDouble.max(2.0))

    def size: Int = ids.length

    /** Deterministic level: uniform from the first 8 md5 bytes of the id. */
    private def levelOf(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var bits = 0L
      var i = 0
      while (i < 8) { bits = (bits << 8) | (d(i) & 0xffL); i += 1 }
      val u = ((bits >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0,1]
      math.floor(-math.log(u) * mL).toInt
    }

    private def dist(q: Array[Double], qn: Double, node: Int): Double = {
      val v = vecs(node)
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += q(i) * v(i); i += 1 }
      1.0 - dot / math.sqrt(qn * norms(node))
    }

    /** Best-first beam search on one layer; returns (dist, node) sorted
      * ascending by (dist, id). `ef` bounds the result beam — when it
      * never fills (ef ≥ reachable nodes) this is a full traversal. */
    private def searchLayer(q: Array[Double], qn: Double, enter: Seq[Int],
        ef: Int, level: Int): mutable.ArrayBuffer[(Double, Int)] = {
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
      val visited = mutable.HashSet[Int]()
      val cand = mutable.PriorityQueue[(Double, Int)]()(ord.reverse) // min-first
      val res = mutable.PriorityQueue[(Double, Int)]()(ord)          // max-first
      enter.foreach { n =>
        if (visited.add(n)) { val d = dist(q, qn, n); cand.enqueue((d, n)); res.enqueue((d, n)) }
      }
      while (res.length > ef) res.dequeue()
      while (cand.nonEmpty) {
        val (cd, cn) = cand.dequeue()
        if (res.length >= ef && cd > res.head._1) { cand.clear() }
        else {
          val nb = links(cn)(level)
          var i = 0
          while (i < nb.length) {
            val n = nb(i)
            if (visited.add(n)) {
              val d = dist(q, qn, n)
              if (res.length < ef || d < res.head._1 ||
                  (d == res.head._1 && ids(n) < ids(res.head._2))) {
                cand.enqueue((d, n)); res.enqueue((d, n))
                while (res.length > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
      val out = mutable.ArrayBuffer[(Double, Int)]()
      out ++= res
      out.sortInPlaceBy { case (d, n) => (d, ids(n)) }
      out
    }

    /** Malkov Algorithm 4 (SELECT-NEIGHBORS-HEURISTIC) with pruned-
      * connection backfill: scan candidates nearest-first, keep one only
      * if it is closer to the base point than to every already-kept
      * neighbor (diversity — without this, clustered corpora link each
      * node to near-duplicates only and greedy search cannot cross
      * clusters), then backfill with the pruned remainder up to m. The
      * backfill keeps EVERYTHING when m ≥ candidate count, which is what
      * makes the degenerate regime provably complete. */
    private def selectNeighbors(cands: Seq[(Double, Int)]): Seq[(Double, Int)] = {
      if (cands.lengthCompare(m) <= 0) return cands
      val kept = mutable.ArrayBuffer[(Double, Int)]()
      val pruned = mutable.ArrayBuffer[(Double, Int)]()
      cands.foreach { case (d, c) =>
        if (kept.length < m) {
          val diverse = kept.forall { case (_, s) =>
            dist(vecs(c), norms(c), s) > d }
          if (diverse) kept += ((d, c)) else pruned += ((d, c))
        }
      }
      kept ++= pruned.take(m - kept.length)
      kept.toSeq
    }

    def insert(id: Long, vec: Array[Double]): Unit = {
      var n2 = 0.0
      var i = 0
      while (i < vec.length) { n2 += vec(i) * vec(i); i += 1 }
      val node = ids.length
      val lvl = levelOf(id)
      ids += id; vecs += vec; norms += n2; levels += lvl
      links += Array.fill(lvl + 1)(mutable.ArrayBuffer[Int]())
      if (entry < 0) { entry = node; maxLevel = lvl; return }
      var ep = Seq(entry)
      // greedy descent through layers above the node's top level
      var l = maxLevel
      while (l > lvl) {
        ep = Seq(searchLayer(vec, n2, ep, 1, l).head._2)
        l -= 1
      }
      // connect on each shared layer
      l = math.min(lvl, maxLevel)
      while (l >= 0) {
        val found = searchLayer(vec, n2, ep, efConstruction, l)
        val neigh = selectNeighbors(found.toSeq)
        neigh.foreach { case (_, nb) =>
          links(node)(l) += nb
          links(nb)(l) += node
          if (links(nb)(l).length > m) {
            // re-select the neighbor's list with the same heuristic,
            // relative to the neighbor (tie order by id for determinism)
            val kept = selectNeighbors(
              links(nb)(l)
                .map(x => (dist(vecs(nb), norms(nb), x), x))
                .sortBy { case (d, x) => (d, ids(x)) }.toSeq).map(_._2)
            links(nb)(l).clear(); links(nb)(l) ++= kept
          }
        }
        ep = found.map(_._2).toSeq
        l -= 1
      }
      if (lvl > maxLevel) { maxLevel = lvl; entry = node }
    }

    /** Persistence dump: one row per node, links as level-indexed
      * arrays. Together with [[PartIndex.restore]] this round-trips the
      * graph EXACTLY (same links, same entry point) — a loaded index
      * answers bit-identically to the index it was saved from. */
    private[graft] def dumpNodes: Iterator[(Int, Long, Array[Double], Int, Seq[Seq[Int]])] =
      ids.indices.iterator.map { n =>
        (n, ids(n), vecs(n), levels(n), links(n).map(_.toSeq).toSeq)
      }
    private[graft] def entryNode: Int = entry
    private[graft] def topLevel: Int = maxLevel

    /** Top-k (id, cosine) by descending cosine; excludes `excludeId`. */
    def search(q: Array[Double], k: Int, efSearch: Int,
        excludeId: Long): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      var qn = 0.0
      var i = 0
      while (i < q.length) { qn += q(i) * q(i); i += 1 }
      var ep = Seq(entry)
      var l = maxLevel
      while (l > 0) { ep = Seq(searchLayer(q, qn, ep, 1, l).head._2); l -= 1 }
      // beam ≥ k+1, not k: when excludeId is in the corpus its self-match
      // occupies a beam slot, and a k-wide beam would post-filter down to
      // k−1 results (ADVICE r8 low #1)
      searchLayer(q, qn, ep, math.max(efSearch, k + 1), 0)
        .iterator.map { case (d, n) => (ids(n), 1.0 - d) }
        .filter(_._1 != excludeId).take(k).toSeq
    }
  }

  private[graft] object PartIndex {
    /** Rebuild a dumped graph verbatim — state restore, NOT re-insertion
      * (re-inserting would rebuild links and, with different arrival
      * order, a different graph). Norms are recomputed with the same
      * ascending loop `insert` uses, so they are bit-identical to the
      * saved instance's. `nodes` must be the complete node set of one
      * graph; any order (sorted by node index here). */
    def restore(m: Int, efConstruction: Int,
        nodes: Seq[(Int, Long, Array[Double], Int, Seq[Seq[Int]])],
        entry: Int, maxLevel: Int): PartIndex = {
      val idx = new PartIndex(m, efConstruction)
      nodes.sortBy(_._1).foreach { case (n, id, vec, lvl, lk) =>
        require(n == idx.ids.length,
          s"Hnsw restore: node indexes not contiguous at $n (graph rows missing?)")
        var n2 = 0.0
        var i = 0
        while (i < vec.length) { n2 += vec(i) * vec(i); i += 1 }
        idx.ids += id; idx.vecs += vec; idx.norms += n2; idx.levels += lvl
        idx.links += lk.map(l => mutable.ArrayBuffer.from(l)).toArray
      }
      idx.entry = entry
      idx.maxLevel = maxLevel
      idx
    }
  }

  /** Sharded HNSW top-k: one index per partition of `data`, queries
    * broadcast, per-shard top-k merged by a global rank window. Returns
    * (query_id, rank, neighbor_id, cosine), rank 1..k.
    *
    * The QUERY side is collected and broadcast — queries are the small
    * probe set by contract (the same smallness contract IVF's centroid
    * table and bruteForce's broadcast side carry); the CORPUS stays
    * fully distributed. Self-matches (same id) are excluded. */
  /** `exact = true` asserts (per shard, where the row count is known)
    * the degenerate-regime precondition `m ≥ n ∧ efSearch ≥ n` that the
    * scaladoc's exactness argument rests on — callers claiming oracle
    * exactness get a loud failure instead of a silently-approximate
    * result if the parameter derivation ever drifts. */
  def topK(queries: DataFrame, data: DataFrame,
      qid: Column, qvec: Column, did: Column, dvec: Column, k: Int,
      m: Int = 16, efConstruction: Int = 64, efSearch: Int = 64,
      exact: Boolean = false, maxQueries: Int = 100000): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    // the smallness contract, enforced: limit(max+1) bounds the fetch
    // itself (a giant query table can't OOM the driver before the check),
    // then the require names the contract instead of a bare OOM
    val qRows = queries.select(qid.cast("long").as("qid"),
        qvec.cast("array<double>").as("qv"))
      .limit(maxQueries + 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(qRows.length <= maxQueries,
      s"Hnsw.topK: query side exceeds the broadcast smallness contract " +
        s"(> $maxQueries rows) — raise maxQueries deliberately or batch " +
        s"the queries; the CORPUS side is the distributed one")
    val qB = spark.sparkContext.broadcast(qRows)
    val d = Similarity.spread(
      data.select(did.cast("long").as("id"), dvec.cast("array<double>").as("v")))
      .as[(Long, Array[Double])]
    val perShard = d.mapPartitions { it =>
      val idx = new PartIndex(m, efConstruction)
      // deterministic build order: same rows → same graph, any engine
      it.toArray.sortBy(_._1).foreach { case (id, v) => idx.insert(id, v) }
      if (exact) require(m >= idx.size && efSearch >= idx.size,
        s"Hnsw.topK(exact=true): shard has ${idx.size} rows but m=$m, " +
          s"efSearch=$efSearch — the provably-exact regime needs both ≥ rows/shard")
      if (idx.size == 0) Iterator.empty
      else qB.value.iterator.flatMap { case (q, qv) =>
        idx.search(qv, k, efSearch, excludeId = q)
          .map { case (nid, cos) => (q, nid, cos) }
      }
    }.toDF("query_id", "neighbor_id", "cosine")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    perShard.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Persist sharded HNSW graphs: build one [[PartIndex]] per partition
    * of `data` (exactly as [[topK]] would) and serialize each graph as
    * parquet rows under `path/graphs` — (node, id, vec, level,
    * level-indexed links), partitioned by shard so one query task
    * rebuilds whole graphs from whole files — plus a `path/meta` marker
    * pinning (m, efConstruction): search quality is a property of the
    * BUILT graph, so a reader must know what it is probing, and a
    * mismatched assumption fails loudly at load instead of silently
    * degrading recall. Parquet round-trips doubles and int arrays
    * exactly, so a restored graph answers bit-identically to the
    * instance it was saved from (HnswSpec pins this in the approximate
    * regime, where it is NOT implied by exactness).
    *
    * Same build-once/query-many motivation as [[Similarity.ivfSave]]:
    * at corpus scale the graph build (the expensive, insert-ordered
    * part) happens in one batch job; later jobs probe from disk. */
  def hnswSave(data: DataFrame, did: Column, dvec: Column, path: String,
      m: Int = 16, efConstruction: Int = 64): Unit = {
    val spark = data.sparkSession
    import spark.implicits._
    val d = Similarity.spread(
      data.select(did.cast("long").as("id"), dvec.cast("array<double>").as("v")))
      .as[(Long, Array[Double])]
    val rows = d.mapPartitions { it =>
      val shard = org.apache.spark.TaskContext.getPartitionId()
      val idx = new PartIndex(m, efConstruction)
      it.toArray.sortBy(_._1).foreach { case (id, v) => idx.insert(id, v) }
      if (idx.size == 0) Iterator.empty
      else {
        val (entry, top) = (idx.entryNode, idx.topLevel)
        idx.dumpNodes.map { case (n, id, vec, lvl, lk) =>
          (shard, n, id, vec, lvl, lk, entry, top)
        }
      }
    }.toDF("shard", "node", "id", "vec", "level", "links", "entry", "max_level")
    // atomic generation publish (graft.core.IndexGen, shared with
    // ivfSave/pqSave): graphs + meta land in a fresh gen dir, one marker
    // rename makes both visible together — a reader never pairs new
    // graphs with old meta (or vice versa)
    val (dir, gen) = graft.core.IndexGen.stage(path)
    rows.write.mode("overwrite").partitionBy("shard").parquet(s"$dir/graphs")
    Seq((m, efConstruction)).toDF("m", "ef_construction")
      .write.mode("overwrite").parquet(s"$dir/meta")
    graft.core.IndexGen.commit(path, gen)
  }

  /** Top-k against a [[hnswSave]]d index without rebuilding the graphs.
    * Graph rows shuffle by shard; each task restores its shards' graphs
    * verbatim ([[PartIndex.restore]]) and runs the same beam search as
    * [[topK]] — per-shard top-k, global rank-window merge. The query
    * side keeps [[topK]]'s broadcast smallness contract. `exact = true`
    * asserts the per-shard degenerate-regime precondition like [[topK]]. */
  def hnswLoadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, qid: Column, qvec: Column, k: Int,
      efSearch: Int = 64, exact: Boolean = false,
      maxQueries: Int = 100000): DataFrame = {
    import spark.implicits._
    val dir = graft.core.IndexGen.readDir(path)
    val metaRow = spark.read.parquet(s"$dir/meta").collect()(0)
    val (m, efc) = (metaRow.getAs[Int]("m"), metaRow.getAs[Int]("ef_construction"))
    val qRows = queries.select(qid.cast("long").as("qid"),
        qvec.cast("array<double>").as("qv"))
      .limit(maxQueries + 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(qRows.length <= maxQueries,
      s"Hnsw.hnswLoadTopK: query side exceeds the broadcast smallness " +
        s"contract (> $maxQueries rows)")
    val qB = spark.sparkContext.broadcast(qRows)
    val g = spark.read.parquet(s"$dir/graphs")
      .select(col("shard").cast("int"), col("node"), col("id"), col("vec"),
        col("level"), col("links"), col("entry"), col("max_level"))
      .repartition(col("shard"))
      .as[(Int, Int, Long, Seq[Double], Int, Seq[Seq[Int]], Int, Int)]
    val perShard = g.mapPartitions { it =>
      // a task may receive several whole shards (hash co-location) —
      // restore and search each independently
      it.toSeq.groupBy(_._1).iterator.flatMap { case (_, rows) =>
        val idx = PartIndex.restore(m, efc,
          rows.map(r => (r._2, r._3, r._4.toArray, r._5, r._6)),
          rows.head._7, rows.head._8)
        if (exact) require(m >= idx.size && efSearch >= idx.size,
          s"Hnsw.hnswLoadTopK(exact=true): shard has ${idx.size} rows but " +
            s"m=$m, efSearch=$efSearch — the provably-exact regime needs both ≥ rows/shard")
        qB.value.iterator.flatMap { case (q, qv) =>
          idx.search(qv, k, efSearch, excludeId = q)
            .map { case (nid, cos) => (q, nid, cos) }
        }
      }
    }.toDF("query_id", "neighbor_id", "cosine")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    perShard.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
