package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance scoring (reference: stdlib/indexing/bm25.py:41
  * TantivyBM25 + engine tantivy_integration.rs — an embedded Tantivy
  * index).
  *
  * Spark-first re-expression: the "index" is a postings DataFrame
  * (term → doc, tf) built by tokenize+explode — i.e. the classic
  * distributed inverted index as data, not as a side-car service. Scoring
  * a query = equi-join of its terms against the postings (shuffled hash
  * join on term), then the BM25 sum per (query, doc). At 100 TB the
  * postings table is partitioned/bucketed by term, queries broadcast.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Build the postings + doc-stats tables from a corpus.
    * Returns (postings(term, id, tf), docLen(id, len), n docs, avgLen).
    */
  def buildIndex(df: DataFrame, id: Column, text: Column):
      (DataFrame, DataFrame) = {
    val toks = df.select(id.as("id"), explode(split(text, " ")).as("term"))
    val postings = toks.groupBy("term", "id").agg(count(lit(1)).as("tf"))
    val docLen = toks.groupBy("id").agg(count(lit(1)).as("len"))
    (postings, docLen)
  }

  /** BM25 score of every (query, doc) pair with at least one matching
    * term. `queries(qid, qtext)`; returns (qid, id, score).
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (Lucene/Tantivy variant)
    * tfn = tf·(k1+1) / (tf + k1·(1 - b + b·len/avgLen))
    */
  def score(corpus: DataFrame, cid: Column, ctext: Column,
      queries: DataFrame, qid: Column, qtext: Column): DataFrame = {
    val (postings, docLen) = buildIndex(corpus, cid, ctext)
    val stats = docLen.agg(count(lit(1)).as("n"), avg(col("len")).as("avgdl"))
    val df_ = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val qTerms = queries
      .select(qid.as("qid"), explode(array_distinct(split(qtext, " "))).as("term"))
    qTerms
      .join(postings, "term")
      .join(df_, "term")
      .join(docLen, "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("tfn",
        col("tf") * (K1 + 1) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("len") / col("avgdl"))))
      .groupBy("qid", "id")
      .agg(sum(col("idf") * col("tfn")).as("score"))
  }

  /** Top-k retrieval per query. */
  def topK(corpus: DataFrame, cid: Column, ctext: Column,
      queries: DataFrame, qid: Column, qtext: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    score(corpus, cid, ctext, queries, qid, qtext)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** TF-IDF relevance — the classic lexical baseline beside [[score]]
    * (smoothed idf, sklearn convention): doc term weight
    * w(t,d) = tf · (ln((N+1)/(df+1)) + 1), doc vector L2-normalized, a
    * query scores Σ_{t∈q} w(t,d)/‖d‖ (binary query weights — cosine
    * against the normalized doc vector). Same distributed shape as BM25:
    * postings as data, one equi-join on term, map-side-combined sums —
    * the norm table is one extra aggregate over postings, nothing
    * corpus-quadratic. */
  def tfidfScore(corpus: DataFrame, cid: Column, ctext: Column,
      queries: DataFrame, qid: Column, qtext: Column): DataFrame = {
    val (postings, docLen) = buildIndex(corpus, cid, ctext)
    val nDocs = docLen.agg(count(lit(1)).as("n"))
    val df_ = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val weights = postings.join(df_, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("w",
        col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0))
      .select("term", "id", "w")
    val norms = weights.groupBy("id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val qTerms = queries
      .select(qid.as("qid"), explode(array_distinct(split(qtext, " "))).as("term"))
    qTerms.join(weights, "term").join(norms, "id")
      .groupBy("qid", "id")
      .agg((sum(col("w")) / max(col("nrm"))).as("score"))
  }

  /** Top-k TF-IDF retrieval per query (rank over rounded scores for
    * cross-engine-stable ordering, like the BM25 query path). */
  def tfidfTopK(corpus: DataFrame, cid: Column, ctext: Column,
      queries: DataFrame, qid: Column, qtext: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    tfidfScore(corpus, cid, ctext, queries, qid, qtext)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion of retriever outputs (reference:
    * stdlib/indexing/hybrid_index.py:14 HybridIndex). Each input is
    * (qid, id, rank); fused score = Σ 1/(k0 + rank). */
  def rrfFuse(k0: Int, results: DataFrame*): DataFrame = {
    val all = results.map(_.select(col("qid"), col("id"), col("rank")))
      .reduce(_ unionByName _)
    all.groupBy("qid", "id")
      .agg(sum(lit(1.0) / (lit(k0) + col("rank"))).as("rrf_score"))
  }
}
