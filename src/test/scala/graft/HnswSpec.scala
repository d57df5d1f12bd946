package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Similarity}

/** Partitioned HNSW semantics (reference: USearch HNSW integration):
  * exact in the degenerate-parameter regime, recall-bounded and
  * deterministic in the approximate regime. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = {
    // 60 deterministic 8-dim vectors in 3 well-separated clusters; the
    // noise hash has a long period so no two vectors are identical (an
    // earlier modular generator produced exact duplicates every 39
    // seeds — cosine-1.0 plateaus that make recall measurement
    // meaningless)
    def vec(seed: Long): Seq[Double] = {
      val base = (seed % 3).toInt
      (0 until 8).map { d =>
        val center = if (d % 3 == base) 1.0 else 0.0
        center + 0.02 * (((seed * 2654435761L + d * 40503L) % 1009L) - 504L) / 1009.0
      }
    }
    (0L until 60L).map(i => (i, vec(i))).toDF("id", "v")
  }

  test("exact regime (ef ≥ partition rows) equals brute-force top-k") {
    val e = embeddings
    val q = e.filter(col("id") < 5)
    val got = Hnsw.topK(q, e, col("id"), col("v"), col("id"), col("v"),
        k = 4, m = 128, efConstruction = 128, efSearch = 128)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val want = Similarity.bruteForceTopK(q, e, col("id"), col("v"),
        col("id"), col("v"), k = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    assert(rowsOf(got) == rowsOf(want))
  }

  test("approximate regime: deterministic across reruns, recall ≥ 0.9") {
    val e = embeddings
    val q = e.filter(col("id") < 10)
    def run() = Hnsw.topK(q, e, col("id"), col("v"), col("id"), col("v"),
        k = 3, m = 4, efConstruction = 8, efSearch = 8)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val a = rowsOf(run())
    assert(rowsOf(run()) == a, "same data + params must reproduce exactly")
    val exact = rowsOf(Similarity.bruteForceTopK(q, e, col("id"), col("v"),
        col("id"), col("v"), k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id")))
    val overlap = a.map(r => (r(0), r(2))) intersect exact.map(r => (r(0), r(2)))
    assert(overlap.size >= (exact.size * 0.9).toInt,
      s"recall ${overlap.size}/${exact.size} below 0.9")
  }

  test("randomized differential: exact regime equals brute force on uniform data") {
    val rnd = new scala.util.Random(42)
    val e = (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
      .toDF("id", "v")
    val q = e.filter(col("id") % 20 === 0)
    val got = Hnsw.topK(q, e, col("id"), col("v"), col("id"), col("v"),
        k = 5, m = 256, efConstruction = 256, efSearch = 256)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val want = Similarity.bruteForceTopK(q, e, col("id"), col("v"),
        col("id"), col("v"), k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    assert(rowsOf(got) == rowsOf(want))
  }

  test("self-match in the beam does not shorten results to k−1") {
    // single worker-local index (the sharded path spreads the corpus, so
    // partitioning would mask the beam edge): query IS corpus member 0,
    // efSearch below k forces the beam to exactly its floor — pre-fix
    // floor k kept the self-match in a slot and post-filtered to k−1
    val idx = new Hnsw.PartIndex(8, 16)
    def vec(seed: Long): Array[Double] =
      Array.tabulate(4)(d => 1.0 + 0.1 * (((seed * 31 + d * 7) % 11) - 5))
    (0L until 6L).foreach(i => idx.insert(i, vec(i)))
    val got = idx.search(vec(0L), k = 4, efSearch = 1, excludeId = 0L)
    assert(got.length == 4, s"expected k=4 results, got ${got.length}")
    assert(!got.exists(_._1 == 0L))
  }

  test("exact=true guard trips when parameters fall below shard size") {
    val e = embeddings
    val q = e.filter(col("id") < 2)
    val bad = Hnsw.topK(q, e, col("id"), col("v"), col("id"), col("v"),
      k = 3, m = 4, efConstruction = 8, efSearch = 8, exact = true)
    val ex = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("provably-exact regime")), s"got: $ex")
    // and the guard is quiet when the precondition actually holds
    val ok = Hnsw.topK(q, e, col("id"), col("v"), col("id"), col("v"),
      k = 3, m = 128, efConstruction = 128, efSearch = 128, exact = true)
    assert(ok.count() > 0)
  }

  test("maxQueries guard trips loudly instead of collecting a huge query side") {
    val e = embeddings
    val ex = intercept[IllegalArgumentException] {
      Hnsw.topK(e, e, col("id"), col("v"), col("id"), col("v"),
        k = 2, maxQueries = 3)
    }
    assert(ex.getMessage.contains("smallness contract"))
    // quiet when within the cap
    val ok = Hnsw.topK(e.limit(2), e, col("id"), col("v"), col("id"), col("v"),
      k = 2, m = 128, efConstruction = 128, efSearch = 128, maxQueries = 3)
    assert(ok.count() > 0)
  }

  test("retriever façade surfaces hnsw results") {
    val e = embeddings
    val r = graft.operators.DataIndex.hnsw(e, col("id"), col("v"),
      m = 128, efConstruction = 128, efSearch = 128)
    val out = r.retrieve(e.filter(col("id") === 0), col("id"), col("v"), 2)
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("qid", "rank", "id", "score"))
  }

  test("persisted graphs answer identically to ad-hoc topK in the APPROXIMATE regime") {
    // exactness would make equality trivial (both sides = brute force);
    // approximate parameters pin the stronger claim — the save→load
    // round-trip restores the very same graphs, so even recall-lossy
    // results are bit-identical to the instance that was saved
    val e = embeddings.repartition(4, col("id"))
    val q = e.filter(col("id") < 10)
    val path = java.nio.file.Files.createTempDirectory("hnsw_spec").toString
    Hnsw.hnswSave(e, col("id"), col("v"), path, m = 4, efConstruction = 8)
    val loaded = rowsOf(Hnsw.hnswLoadTopK(spark, path, q, col("id"), col("v"),
      k = 3, efSearch = 8))
    val adHoc = rowsOf(Hnsw.topK(q, e, col("id"), col("v"), col("id"), col("v"),
      k = 3, m = 4, efConstruction = 8, efSearch = 8))
    assert(loaded == adHoc)
  }

  test("hnswAppend grows the index as a segment; approximate-regime " +
      "recall holds and reruns are deterministic") {
    val e = embeddings.repartition(2, col("id"))
    val q = e.filter(col("id") < 10)
    val path = java.nio.file.Files.createTempDirectory("hnsw_spec_a").toString
    def build(p: String): Unit = {
      Hnsw.hnswSave(e.filter(col("id") < 40), col("id"), col("v"), p,
        m = 4, efConstruction = 8)
      Hnsw.hnswAppend(spark, p, e.filter(col("id") >= 40),
        col("id"), col("v"))
    }
    build(path)
    val got = rowsOf(Hnsw.hnswLoadTopK(spark, path, q, col("id"), col("v"),
      k = 3, efSearch = 8))
    // appended rows are searchable: neighbors from the new segment appear
    assert(got.exists(r => r(2).asInstanceOf[Long] >= 40L),
      s"expected appended ids among neighbors: $got")
    val exact = rowsOf(Similarity.bruteForceTopK(q, e, col("id"), col("v"),
        col("id"), col("v"), k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine")))
    val overlap = got.map(r => (r(0), r(2))) intersect
      exact.map(r => (r(0), r(2)))
    assert(overlap.size >= (exact.size * 0.9).toInt,
      s"recall ${overlap.size}/${exact.size} below 0.9")
    // determinism: an identical save+append sequence reproduces exactly
    val path2 = java.nio.file.Files.createTempDirectory("hnsw_spec_a2").toString
    build(path2)
    assert(rowsOf(Hnsw.hnswLoadTopK(spark, path2, q, col("id"), col("v"),
      k = 3, efSearch = 8)) == got)
  }

  test("hnswCompact folds segments by inserting into the restored base " +
      "graphs: one segment after, recall holds, idempotent") {
    val e = embeddings.repartition(2, col("id"))
    val q = e.filter(col("id") < 10)
    val path = java.nio.file.Files.createTempDirectory("hnsw_spec_c").toString
    Hnsw.hnswSave(e.filter(col("id") < 40), col("id"), col("v"), path,
      m = 4, efConstruction = 8)
    Hnsw.hnswAppend(spark, path, e.filter(col("id") >= 40),
      col("id"), col("v"))
    val gen1 = Hnsw.hnswCompact(spark, path)
    val dir = graft.core.IndexGen.readDir(path)
    val manifest = java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "segments.txt"))
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    assert(manifest.length == 1,
      s"expected a one-segment manifest after compact: $manifest")
    val folded = rowsOf(Hnsw.hnswLoadTopK(spark, path, q, col("id"),
      col("v"), k = 3, efSearch = 8))
    // every id (base + inserted) is reachable in the folded graphs
    assert(folded.exists(r => r(2).asInstanceOf[Long] >= 40L))
    val exact = rowsOf(Similarity.bruteForceTopK(q, e, col("id"), col("v"),
        col("id"), col("v"), k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine")))
    val overlap = folded.map(r => (r(0), r(2))) intersect
      exact.map(r => (r(0), r(2)))
    assert(overlap.size >= (exact.size * 0.9).toInt,
      s"recall ${overlap.size}/${exact.size} below 0.9")
    // idempotence: compacting a one-segment index is a no-op (same
    // generation back, results unchanged)
    val gen2 = Hnsw.hnswCompact(spark, path)
    assert(gen2 == gen1, s"second compact must be a no-op: $gen1 -> $gen2")
    assert(rowsOf(Hnsw.hnswLoadTopK(spark, path, q, col("id"), col("v"),
      k = 3, efSearch = 8)) == folded)
  }

  test("persisted exact=true guard still trips on undersized parameters") {
    val e = embeddings
    val path = java.nio.file.Files.createTempDirectory("hnsw_spec_g").toString
    Hnsw.hnswSave(e, col("id"), col("v"), path, m = 4, efConstruction = 8)
    val ex = intercept[org.apache.spark.SparkException] {
      Hnsw.hnswLoadTopK(spark, path, e.filter(col("id") < 2),
        col("id"), col("v"), k = 2, efSearch = 8, exact = true).count()
    }
    assert(ex.getMessage.contains("provably-exact regime"))
  }
}
