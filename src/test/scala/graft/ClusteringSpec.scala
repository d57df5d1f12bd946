package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Similarity, TextOps}

/** Deterministic k-means, SemDeDup, PQ ANN, and separator chunking. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated blobs on orthogonal axes: x-heavy ids 1-3,
  // y-heavy ids 11-13
  private def blobs = Seq(
    (1L, Array(10.0, 0.1)), (2L, Array(9.0, 0.2)), (3L, Array(11.0, 0.0)),
    (11L, Array(0.1, 10.0)), (12L, Array(0.0, 9.0)), (13L, Array(0.2, 11.0)))
    .toDF("id", "v")

  test("kmeans separates well-separated blobs") {
    val out = Clustering.kmeans(blobs, col("id"), col("v"), k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 11L, 12L, 13L))
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(11L), out(12L), out(13L)).size == 1)
    assert(out(1L) != out(11L))
  }

  test("kmeans is deterministic across reruns") {
    val a = rowsOf(Clustering.kmeans(blobs, col("id"), col("v"), 2, 1))
    val b = rowsOf(Clustering.kmeans(blobs, col("id"), col("v"), 2, 1))
    assert(a == b)
  }

  test("kmeans rounds=0 assigns against the raw md5-sample seed") {
    val out = Clustering.kmeans(blobs, col("id"), col("v"), k = 6, rounds = 0)
    // k = corpus size: every row is its own seed; each assigns to the
    // centroid it IS (cosine distance 0 to itself)
    assert(out.count() == 6)
  }

  test("kmeansSave → kmeansLoadAssign ≡ direct assignment") {
    val model = Clustering.kmeansFit(blobs, col("id"), col("v"), 2, 1)
    val path = java.nio.file.Files.createTempDirectory("km_spec").toString
    Clustering.kmeansSave(model, path)
    val direct = rowsOf(Clustering.kmeansAssign(blobs, col("id"), col("v"), model))
    val loaded = rowsOf(Clustering.kmeansLoadAssign(spark, path,
      blobs, col("id"), col("v")))
    assert(loaded == direct)
    // the model is k rows of (cid, cv, cvn2) in the committed generation
    // dir (model saves publish atomically like every index save)
    val m = spark.read.parquet(
      s"${graft.core.IndexGen.readDir(path)}/centroids")
    assert(m.columns.toSet == Set("cid", "cv", "cvn2") && m.count() == 2)
  }

  test("semDedup drops near-identical same-cluster rows, keeps smallest id") {
    val d = Seq(
      (1L, Array(10.0, 0.1)), (2L, Array(20.0, 0.2)), // 2 = scaled copy of 1
      (3L, Array(8.0, 4.0)),                          // same blob, dissimilar
      (11L, Array(0.1, 10.0)), (12L, Array(0.2, 20.0)))
      .toDF("id", "v")
    val out = Clustering.semDedup(d, col("id"), col("v"),
        k = 2, rounds = 1, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && !out(2L)) // 2 has the smaller-id witness 1
    assert(out(11L) && !out(12L))
    assert(out(3L)) // same cluster as 1/2 but below tau
  }

  // 8 tight groups of 8 members in 16 dims: prototype direction per
  // group + a small deterministic perturbation per (member, dim) — the
  // regime PQ serves (clustered embeddings), with a deterministic
  // fixture (no RNG, so sampled codebooks are fixed too)
  private def grouped = {
    val rows = for (g <- 0 until 8; j <- 0 until 8) yield {
      val v = Array.tabulate(16) { d =>
        val proto = if (d / 2 == g) 1.0 else 0.0
        proto + ((g * 31 + j * 7 + d) % 5 - 2) / 40.0
      }
      ((g * 8 + j).toLong, v)
    }
    rows.toDF("id", "v")
  }

  test("pqTopK with rescore ≈ exact top-k on clustered data") {
    val d = grouped
    val q = d.filter(col("id") % 8 === 0)
    val exact = Similarity.bruteForceTopK(q, d, col("id"), col("v"),
        col("id"), col("v"), k = 3, dim = 16)
      .select("query_id", "rank", "neighbor_id")
    val pq = Similarity.pqTopK(q, d, col("id"), col("v"), col("id"),
        col("v"), m = 4, ksub = 32, k = 3, rescore = 16, dim = 16)
      .select("query_id", "rank", "neighbor_id")
    val e = rowsOf(exact)
    val p = rowsOf(pq)
    val recall = p.count(e.contains).toDouble / e.size
    assert(recall >= 0.9, s"pq+rescore recall@3 = $recall")
  }

  test("pqTopK with rescore >= corpus size recovers exact ranking") {
    // the FAISS refine-stage guarantee: when the shortlist covers every
    // candidate, PQ order is irrelevant and the output IS brute force
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 120)
    val q = emb.filter(col("vec_id") % 20 === 0)
    val exact = Similarity.bruteForceTopK(q, emb, col("vec_id"),
        col("embedding"), col("vec_id"), col("embedding"), k = 3, dim = 64)
      .select("query_id", "rank", "neighbor_id")
    val pq = Similarity.pqTopK(q, emb, col("vec_id"), col("embedding"),
        col("vec_id"), col("embedding"), m = 8, ksub = 16, k = 3,
        rescore = 200, dim = 64)
      .select("query_id", "rank", "neighbor_id")
    assert(rowsOf(pq) == rowsOf(exact))
  }

  test("pqTopK is deterministic across reruns (no-rescore integer ranking)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 20 === 0)
    def run() = rowsOf(Similarity.pqTopK(q, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"),
      m = 8, ksub = 16, k = 3, rescore = 0, dim = 64)
      .select("query_id", "rank", "neighbor_id"))
    assert(run() == run())
  }

  test("pqSave → pqLoadTopK answers identically to the ad-hoc path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 20 === 0)
    val adhoc = rowsOf(Similarity.pqTopK(q, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"),
      m = 8, ksub = 16, k = 3, rescore = 8, dim = 64))
    val idx = java.nio.file.Files.createTempDirectory("pq_spec").toString
    Similarity.pqSave(emb, col("vec_id"), col("embedding"), idx,
      m = 8, ksub = 16, dim = 64)
    val loaded = rowsOf(Similarity.pqLoadTopK(spark, idx, q, col("vec_id"),
      col("embedding"), k = 3, rescore = 8,
      rescoreAgainst = Some((emb, col("vec_id"), col("embedding")))))
    assert(loaded == adhoc)
    // codes are the persisted corpus representation: m ints per vector,
    // one manifest-listed segment (the pqAppend growth layout; saves
    // publish atomically)
    val codes = Similarity.binaryLoadParts(spark, idx)
    assert(codes.columns.toSet == Set("neighbor_id", "codes"))
    assert(codes.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
  }

  test("ivfPqRetrieve ≈ exact top-k on clustered data") {
    val d = grouped
    val q = d.filter(col("id") % 8 === 0)
    val exact = Similarity.bruteForceTopK(q, d, col("id"), col("v"),
        col("id"), col("v"), k = 3, dim = 16)
      .select("query_id", "rank", "neighbor_id")
    val ivfpq = Similarity.ivfPqRetrieve(q, d, col("id"), col("v"),
        col("id"), col("v"), nlist = 8, nprobe = 4, m = 4, ksub = 32,
        k = 3, rescore = 16, excludeSelf = true, dim = 16)
      .select("query_id", "rank", "neighbor_id")
    val e = rowsOf(exact)
    val p = rowsOf(ivfpq)
    val recall = p.count(e.contains).toDouble / e.size
    assert(recall >= 0.8, s"ivf-pq recall@3 = $recall")
  }

  test("ivfPqSave → ivfPqLoadTopK ≡ ad-hoc; codes-only lists at rest") {
    val d = grouped
    val q = d.filter(col("id") % 8 === 0)
    val adhoc = rowsOf(Similarity.ivfPqRetrieve(q, d, col("id"), col("v"),
        col("id"), col("v"), nlist = 8, nprobe = 4, m = 4, ksub = 32,
        k = 3, rescore = 16, excludeSelf = true, dim = 16)
      .select("query_id", "rank", "neighbor_id"))
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_spec").toString
    Similarity.ivfPqSave(d, col("id"), col("v"), idx,
      nlist = 8, m = 4, ksub = 32, dim = 16)
    val loaded = rowsOf(Similarity.ivfPqLoadTopK(spark, idx, q,
        col("id"), col("v"), nprobe = 4, k = 3, rescore = 16,
        rescoreAgainst = (d, col("id"), col("v")), excludeSelf = true)
      .select("query_id", "rank", "neighbor_id"))
    assert(loaded == adhoc)
    // the persisted lists hold (neighbor_id, cid-partition, codes) — m
    // small ints per vector, never a float vector
    val lists = Similarity.binaryLoadParts(spark, idx)
    assert(lists.columns.toSet == Set("neighbor_id", "cid", "codes"))
    assert(lists.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    // restrictTo pushes an id filter into the lists pre-rank: survivors
    // only, still k of them when enough match
    val evenOnly = d.filter(col("id") % 2 === 0).select(col("id"))
    val restricted = Similarity.ivfPqLoadTopK(spark, idx, q,
        col("id"), col("v"), nprobe = 4, k = 3, rescore = 16,
        rescoreAgainst = (d, col("id"), col("v")), excludeSelf = true,
        restrictTo = Some(evenOnly))
      .collect()
    assert(restricted.nonEmpty &&
      restricted.forall(_.getAs[Long]("neighbor_id") % 2 == 0))
  }

  test("ivfPqRetrieve requires a refine stage") {
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqRetrieve(blobs, blobs, col("id"), col("v"),
        col("id"), col("v"), nlist = 2, nprobe = 1, m = 2, ksub = 2,
        k = 1, rescore = 0, dim = 2)
    }
    assert(e.getMessage.contains("rescore"))
  }

  test("pqBuild rejects m not dividing dim") {
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(blobs, blobs, col("id"), col("v"), col("id"),
        col("v"), m = 3, ksub = 2, k = 1, dim = 2)
    }
    assert(e.getMessage.contains("divide"))
  }

  test("chunkBySeparator packs whole pieces under the token budget") {
    val d = Seq((1L, "a b c. d e. f g h i. j")).toDF("id", "text")
    // pieces (". "-split): "a b c"(3) "d e"(2) "f g h i"(4) "j"(1);
    // prefix sums 0,3,5,9 at maxTokens=5 → chunks 0,0,1,1
    val r = TextOps.chunkBySeparator(d, col("id"), col("text"), ". ", 5)
      .orderBy("chunk_id")
      .select("chunk_id", "n_pieces", "n_tokens", "chunk").collect()
    assert(r.map(_.toSeq).toSeq == Seq(
      Seq(0L, 2L, 5L, "a b c. d e"),
      Seq(1L, 2L, 5L, "f g h i. j")))
  }

  test("chunkBySeparator: oversized piece becomes its own oversized chunk") {
    val d = Seq((1L, "one two three four five six|x y")).toDF("id", "text")
    val r = TextOps.chunkBySeparator(d, col("id"), col("text"), "|", 4)
      .orderBy("chunk_id").select("chunk_id", "n_tokens", "chunk").collect()
    assert(r.map(_.toSeq).toSeq == Seq(
      Seq(0L, 6L, "one two three four five six"),
      Seq(1L, 2L, "x y")))
  }

  test("chunkBySeparator carries passthrough metadata") {
    val d = Seq((1L, "a. b", "en")).toDF("id", "text", "lang")
    val r = TextOps.chunkBySeparator(d, col("id"), col("text"), ". ", 10,
      keep = Seq("lang"))
    assert(r.columns.contains("lang"))
    assert(r.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
  }
}
