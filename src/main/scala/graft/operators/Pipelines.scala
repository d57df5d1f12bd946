package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed end-to-end pipelines — the point of the operator library:
  * a real corpus build is not one operator but a CHAIN, and the chain
  * has to stay one declarative Spark plan (filters fused into scans,
  * every stage map-side where the stage allows it) instead of N
  * materialized passes. Each stage below is the individually
  * oracle-checked library operator; the composition query
  * (q_pretrain_pipeline) replays the ENTIRE chain in DuckDB, so the
  * stages are pinned to compose — not just to work in isolation.
  */
object Pipelines {

  /** The standard pre-training corpus build over raw documents:
    *
    *  1. language ID ([[TextOps.langId]]) — keep `keepLang`;
    *  2. quality floor ([[TextOps.qualityScore]] ≥ `minQuality`);
    *  3. exact dedup — smallest id per identical text (the
    *     [[Dedup.exact]] keep rule as a rank-1 window);
    *  4. benchmark decontamination — drop docs sharing ANY `ngram`-gram
    *     with `heldout` (the [[Dedup.shingles]] semi-join, no DF cap);
    *  5. mix sampling ([[Sampling.hashSample]] at `sampleRate`);
    *  6. sequence packing ([[Sampling.packSequences]] under
    *     `packBudget` tokens into `packBuckets` deterministic streams).
    *
    * Scale shape: stages 1-2 are pure column predicates on the scan;
    * stage 3 is one hash-partitioned window; stage 4 is the banded
    * shingle equi-join (the dedup/decontamination shape); stage 5 is a
    * shuffle-free predicate; stage 6 one bucket-partitioned window.
    * Nothing in the chain is pairwise-in-the-corpus or driver-side.
    * Upstream of this function, [[TextOps.cleanText]] /
    * [[DocStore.build]]'s parse stage / [[TextOps.dropBoilerplate]]
    * compose the same way — they are omitted here only because the
    * synthetic corpus has nothing for them to do.
    *
    * Determinism: every stage is a pure function of (ids, text, salt) —
    * the final packed sequences are reproducible on any engine and any
    * partitioning, which is what makes a training corpus auditable.
    * Returns one row per packed document:
    * (doc_id, text, n_tokens, bucket, pack, pack_pos). */
  def pretrainCorpus(docs: DataFrame, id: Column, text: Column,
      markers: Map[String, Seq[String]], keepLang: String,
      stopwords: Seq[String], minQuality: Double,
      heldout: DataFrame, heldoutText: Column, ngram: Int,
      sampleRate: Double, salt: String,
      packBudget: Long, packBuckets: Int): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val langKept = base.filter(TextOps.langId(col("text"), markers) === keepLang)
    val qualKept = langKept.filter(
      TextOps.qualityScore(col("text"), stopwords) >= minQuality)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = qualKept.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val trainShingles = Dedup.shingles(deduped, col("doc_id"), col("text"), ngram)
    val benchShingles = Dedup.shingles(
        heldout.select(heldoutText.as("_ht")), lit(0L), col("_ht"), ngram)
      .select(col("s")).distinct()
    val contaminated = trainShingles.join(benchShingles, Seq("s"))
      .select(col("id").as("doc_id")).distinct()
    val decontaminated = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val sampled = Sampling.hashSample(decontaminated, col("doc_id"),
      sampleRate, salt)
    Sampling.packSequences(
      sampled.withColumn("n_tokens", TextOps.tokenCount(col("text"))),
      col("doc_id"), col("n_tokens"), packBudget, packBuckets, salt)
  }
}
