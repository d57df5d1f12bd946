package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed end-to-end pipelines — the point of the operator library:
  * a real corpus build is not one operator but a CHAIN, and the chain
  * has to stay one declarative Spark plan (filters fused into scans,
  * every stage map-side where the stage allows it) instead of N
  * materialized passes. Each stage below is the individually
  * oracle-checked library operator; the composition queries
  * (q_pretrain_pipeline, q_pretrain_pipeline_full) replay the ENTIRE
  * chain in DuckDB, so the stages are pinned to compose — not just to
  * work in isolation.
  */
object Pipelines {

  /** Near-duplicate canonicalization stage parameters — the
    * [[Dedup.minhashLshPairs]] knobs (shingle n, minhash k, LSH bands,
    * Jaccard threshold, stop-shingle document-frequency cap). */
  final case class NearDupConfig(n: Int = 3, k: Int = 6, bands: Int = 3,
    threshold: Double = 0.8, maxDf: Int = 100)

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
    * The FULL production chain — blocklist filtering, boilerplate
    * removal, and near-duplicate canonicalization interleaved at their
    * proper stages — is [[pretrainCorpusFull]]; this entry point is the
    * minimal chain with those stages off.
    *
    * Scale shape: stages 1-2 are pure column predicates on the scan;
    * stage 3 is one hash-partitioned window; stage 4 is the banded
    * shingle equi-join (the dedup/decontamination shape); stage 5 is a
    * shuffle-free predicate; stage 6 one bucket-partitioned window.
    * Nothing in the chain is pairwise-in-the-corpus or driver-side.
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
      packBudget: Long, packBuckets: Int): DataFrame =
    pretrainCorpusFull(docs, id, text, markers, keepLang, stopwords,
      minQuality, blocklist = Nil, boilerplate = None, nearDup = None,
      heldout = heldout, heldoutText = heldoutText, ngram = ngram,
      sampleRate = sampleRate, salt = salt,
      packBudget = packBudget, packBuckets = packBuckets)

  /** The FULL production pre-training chain — [[pretrainCorpus]]'s six
    * stages plus the three a real corpus build runs between them, in
    * build order:
    *
    *  1. language ID keep;
    *  2. quality floor;
    *  3. blocklist filter ([[TextOps.blocklistFilter]] — one
    *     Aho-Corasick scan, drop on any `blocklist` term);
    *  4. boilerplate removal ([[TextOps.dropBoilerplate]] —
    *     `(separator, minDocs)`: segments occurring in ≥ minDocs
    *     DISTINCT documents are excised from every doc; REWRITES text,
    *     so every later stage sees the cleaned corpus);
    *  5. exact dedup (after boilerplate removal on purpose: template
    *     stripping is exactly what makes near-copies byte-identical);
    *  6. near-duplicate canonicalization ([[Dedup.canonicalize]]:
    *     MinHash-LSH pairs → connected components → keep the
    *     smallest-id representative per cluster);
    *  7. benchmark decontamination (n-gram semi-join vs `heldout`);
    *  8. mix sampling; 9. sequence packing.
    *
    * Scale shape of the added stages: the blocklist is one broadcast
    * automaton scan (pure predicate, fuses into the same scan as stages
    * 1-2); boilerplate is explode → map-side-combinable DF count →
    * broadcast mark-join → one groupBy(id) reassembly; near-dup is the
    * banded LSH equi-join + rows×log-rounds CC — nothing pairwise in
    * the corpus, nothing driver-side. Token counts and shingles
    * downstream are computed on the CLEANED text. Returns
    * (doc_id, text, n_tokens, bucket, pack, pack_pos). */
  def pretrainCorpusFull(docs: DataFrame, id: Column, text: Column,
      markers: Map[String, Seq[String]], keepLang: String,
      stopwords: Seq[String], minQuality: Double,
      blocklist: Seq[String], boilerplate: Option[(String, Long)],
      nearDup: Option[NearDupConfig],
      heldout: DataFrame, heldoutText: Column, ngram: Int,
      sampleRate: Double, salt: String,
      packBudget: Long, packBuckets: Int): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val langKept = base.filter(TextOps.langId(col("text"), markers) === keepLang)
    val qualKept = langKept.filter(
      TextOps.qualityScore(col("text"), stopwords) >= minQuality)
    val blocked =
      if (blocklist.isEmpty) qualKept
      else TextOps.blocklistFilter(qualKept, col("text"), blocklist)
    val cleaned = boilerplate match {
      case None => blocked
      case Some((sep, minDocs)) =>
        TextOps.dropBoilerplate(blocked, col("doc_id"), col("text"),
            sep, minDocs)
          .select(col("id").as("doc_id"), col("text"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = cleaned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val canonical = nearDup match {
      case None => deduped
      case Some(c) =>
        // eager on the INPUT too: canonicalize consumes its frame twice
        // (shingle derivation + the cluster join-back), and `deduped`
        // here is the expensive part of the chain — the boilerplate
        // reassembly shuffle and the exact-dedup window would otherwise
        // run twice per build (raw-scan callers like q_dedup_canonical
        // rightly skip this: re-scanning parquet beats caching a corpus)
        val dedupedOnce = graft.core.Caches.eager(deduped)
        // keepBy = const → the smallest-id member represents its
        // cluster, the same keep rule as the exact-dedup window.
        // eager: the survivor set feeds TWO branches (its own shingle
        // table + the decontamination anti-join), and un-cached each
        // would re-run the whole boilerplate+dedup+LSH+CC upstream
        graft.core.Caches.eager(
          Dedup.canonicalize(dedupedOnce, col("doc_id"), col("text"), lit(0),
              c.n, c.k, c.bands, c.threshold, c.maxDf)
            .select(col("doc_id"), col("text")))
    }
    val trainShingles =
      Dedup.shingles(canonical, col("doc_id"), col("text"), ngram)
    val benchShingles = Dedup.shingles(
        heldout.select(heldoutText.as("_ht")), lit(0L), col("_ht"), ngram)
      .select(col("s")).distinct()
    val contaminated = trainShingles.join(benchShingles, Seq("s"))
      .select(col("id").as("doc_id")).distinct()
    val decontaminated = canonical.join(contaminated, Seq("doc_id"), "left_anti")
    val sampled = Sampling.hashSample(decontaminated, col("doc_id"),
      sampleRate, salt)
    Sampling.packSequences(
      sampled.withColumn("n_tokens", TextOps.tokenCount(col("text"))),
      col("doc_id"), col("n_tokens"), packBudget, packBuckets, salt)
  }
}
