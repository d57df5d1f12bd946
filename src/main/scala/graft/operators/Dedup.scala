package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Caches

/** Deduplication suite for large-scale training-data pipelines.
  *
  * The reference ships the building blocks (LSH `stdlib/ml/classifiers/
  * _lsh.py`, `_knn_lsh.py`, fuzzy join `stdlib/ml/smart_table_ops/
  * _fuzzy_join.py`); here they are composed into the standard corpus-dedup
  * pipelines, Spark-first:
  *
  *  - every hash is a built-in codegen'd expression (md5/xxhash64) — no
  *    UDFs, so whole-stage codegen holds end-to-end;
  *  - candidate generation is always an EQUI-join (on a hash/bucket/
  *    shingle), never a cross join: Catalyst plans shuffled hash joins
  *    that scale horizontally with partitions;
  *  - verification (exact Jaccard / cosine) runs only on the candidate
  *    set, which LSH keeps near-linear in corpus size.
  *
  * All functions are deterministic, so results are reproducible across
  * runs and clusters — a hard requirement for dedup at 100 TB (re-running
  * must not re-shuffle which twin of a pair survives).
  */
object Dedup {

  /** Distinct word n-gram shingles: (id, s) plus any `carry` columns
    * (pre-aliased by the caller). Short docs (< n words) get no shingles.
    *
    * Two scale decisions live here:
    *  - distinctness is per-document, so it is enforced with
    *    `array_distinct` on the per-doc shingle array BEFORE exploding —
    *    a global `.distinct()` would shuffle the exploded table (~50×
    *    the document bytes) for pairs that are already unique per row;
    *  - shingling is the CPU-dominant step of every dedup pipeline, so
    *    if the input arrives in fewer partitions than the session's
    *    shuffle parallelism (e.g. one small parquet file) it is
    *    repartitioned BEFORE the explode, while rows are still cheap to
    *    move. On a real corpus (thousands of input splits) this is a
    *    no-op.
    *
    * The words array is materialized into its own projection before the
    * shingle lambda: inlining `split` into `transform` would re-evaluate
    * it for every `element_at` (O(len²) splits per document — measured
    * 6× slower end-to-end at sf0.1). */
  def shingles(df: DataFrame, id: Column, text: Column, n: Int = 3,
      carry: Seq[Column] = Nil): DataFrame = {
    // one ShinglesExpr eval per row (split once, build once) — the
    // element_at formulation re-split the text n+1 times per shingle
    // (Catalyst inlines producers into lambda references)
    graft.core.Par.spread(df)
      .select((id.as("id") +:
        explode(graft.plans.TextExprs.shingles(text, n, distinct = true))
          .as("s") +: carry): _*)
  }

  /** Stop-shingle filter: drop shingles whose document frequency within
    * `grp` exceeds `maxDf`. A shingle present in k documents emits O(k²)
    * candidate/verification join rows, so hot boilerplate shingles ("the
    * quick brown"-class) make shingle joins quadratic in corpus size; a
    * small DF cap bounds per-shingle work at maxDf² while near-duplicate
    * signal (rare, distinctive shingles) is untouched. One shuffle on
    * `grp` — the same key the downstream join shuffles on. */
  def capShingleDf(sh: DataFrame, grp: Seq[String], maxDf: Int): DataFrame =
    if (maxDf == Int.MaxValue) sh
    else {
      // Anti-join against the (small) hot-shingle list instead of a
      // count-over-window: the window form shuffles AND sorts the whole
      // shingle table, while the hot list after `> maxDf` is boilerplate
      // only — AQE plans the anti-join as a broadcast, so the big branch
      // is never re-shuffled.
      val hot = sh.groupBy(grp.map(col): _*).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > maxDf).drop("_df")
      sh.join(hot, grp, "left_anti")
    }

  /** Exact dedup: keep the lowest id per normalized key; emits
    * (keep_id, n_dups). One hash-shuffle, map-side combined. */
  def exact(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(md5(key).as("k"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))
      .drop("k")

  /** MinHash signature columns h0..h{k-1} per id: hᵢ = min over shingles
    * of md5(i‖"|"‖shingle). String md5 keeps the hash identical across
    * engines and platforms.
    *
    * The min runs as [[graft.plans.AggExprs.minHex32]], not built-in
    * `min`: Spark's Min over StringType has a var-width agg buffer, so
    * every signature build planned a SortAggregate that sorted the
    * exploded corpus shingle table (k columns × both partial/final —
    * 12 SortAggregate nodes in the q_dedup_minhash plan before this).
    * minHex32 holds the digest as two biased longs — fixed-width buffer
    * ⇒ HashAggregate + whole-stage codegen — and reconstructs
    * bit-identical hex per group, so signatures (and every oracle
    * downstream) are unchanged. */
  def minhash(sh: DataFrame, k: Int): DataFrame =
    sh.groupBy("id").agg(
      graft.plans.AggExprs.minHex32(md5(concat(lit("0|"), col("s")))).as("h0"),
      (1 until k).map(i =>
        graft.plans.AggExprs.minHex32(
          md5(concat(lit(s"$i|"), col("s")))).as(s"h$i")): _*)

  // ------------------------------------------------------------------
  // Incremental dedup: a persisted MinHash signature index
  // ------------------------------------------------------------------
  //
  // Batch dedup (minhashLshPairs & co) re-shingles the WHOLE corpus per
  // run — right for a one-shot corpus build, wrong for the production
  // refresh loop, where each day's ingest must dedup against ALL
  // history: at 100 TB re-shingling history per batch is the cost that
  // kills the pipeline. The signature index is the dedup twin of the
  // ANN segment stores (Similarity.ivfAppend): history is represented
  // at rest by its k-column MinHash signature table (one row per doc —
  // ~64 bytes/doc at k=6 vs ~50× the text bytes for shingles), grown by
  // O(new docs) segment appends, probed by band-key equi-join. Neither
  // the historical text nor its shingles are ever re-read.

  /** The in-row signature builder the index paths share: ONE native
    * [[graft.plans.TextExprs.minhashSig]] evaluation per document — no
    * shingle explode, no k-way min(STRING) aggregation (var-width agg
    * buffers force a SortAggregate over the exploded shingle table: the
    * plan audit that motivated the expression), bit-identical hex
    * output. Documents shorter than n words have no signature (the
    * aggregation form's absent-row state).
    *
    * The `explode(array(...))` wrapper is a DELIBERATE once-per-row
    * barrier, not a fan-out (the array has exactly one element): the
    * h-column projection extracts the array k times, and CollapseProject
    * inlines a producer into pure EXTRACTOR references (getItem/
    * getField) regardless of their count — without the barrier the
    * whole k·shingles md5 kernel re-ran PER COLUMN (k× the work; the
    * PlanSpec guard caught it). Generate inputs evaluate once — the
    * same rule the HOF-inlining lesson (CLAUDE.md) documents. */
  private def minhashInRow(df: DataFrame, id: Column, text: Column,
      n: Int, k: Int): DataFrame =
    graft.core.Par.spread(df)
      .select(id.as("id"),
        explode(array(graft.plans.TextExprs.minhashSig(text, n, k)))
          .as("_mh"))
      .filter(col("_mh").isNotNull)
      .select(col("id") +:
        (0 until k).map(i => col("_mh").getItem(i).as(s"h$i")): _*)

  /** Persist a MinHash signature index over a corpus: the (id, h0..hk-1)
    * signature table under an atomic [[graft.core.IndexGen]] generation
    * (segment manifest, so [[signatureAppend]] grows it O(new rows)),
    * plus the (n, k, bands) geometry the signatures were computed with —
    * probes and appends read the geometry from the index, so a caller
    * cannot accidentally mix signature spaces. One O(corpus) in-row
    * signature pass ([[minhashInRow]] — shuffle-free), paid once. */
  def signatureSave(df: DataFrame, id: Column, text: Column, path: String,
      n: Int = 3, k: Int = 6, bands: Int = 3): Unit = {
    require(k % bands == 0, "k must be divisible by bands")
    val sigs = minhashInRow(df, id, text, n, k)
    val (dir, gen) = graft.core.IndexGen.stage(path)
    writeSigMeta(dir, n, k, bands)
    val seg = Similarity.newSegmentName()
    Similarity.writeManifest(dir, Seq(seg)) // manifest-first discipline
    Similarity.writeBinarySegmentTo(sigs, path, seg)
    graft.core.IndexGen.commit(path, gen)
    Similarity.vacuumSegments(path)
  }

  /** Grow a [[signatureSave]]d index by the new documents only — one
    * shingle+minhash pass over `newDf` (geometry read from the index),
    * committed as a manifest segment append: O(new rows) compute and
    * I/O, history never re-read. A signature is a pure per-document
    * function, so append ≡ rebuild exactly (the binaryAppend contract;
    * the spec pins probe-result equality). Same single-writer /
    * caller-feeds-only-new-ids contract as every segment store.
    * Each append commits one manifest segment — run
    * [[signatureCompact]] periodically (daily / every N batches) to
    * fold them back into one, or probe cost grows with segment count.
    * Returns the committed generation. */
  def signatureAppend(spark: org.apache.spark.sql.SparkSession, path: String,
      newDf: DataFrame, id: Column, text: Column): Long = {
    val cur = graft.core.IndexGen.readDir(path)
    val (n, k, _) = readSigMeta(cur)
    signatureAppendSigs(spark, path, minhashInRow(newDf, id, text, n, k))
  }

  /** [[signatureAppend]] over an ALREADY-COMPUTED signature table
    * (id, h0..h{k-1}) — the seam that lets [[dedupRefresh]] append the
    * probe signatures it computed for the history join instead of
    * re-running the whole shingle+minhash kernel over the survivors
    * (a signature is a pure per-row function, so probe rows filtered to
    * the survivor ids ARE minhashInRow(survivors)). Callers must supply
    * signatures computed at the index's own (n, k) geometry. */
  private[operators] def signatureAppendSigs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      sigs: DataFrame): Long = {
    val cur = graft.core.IndexGen.readDir(path)
    val (n, k, bands) = readSigMeta(cur)
    require(sigs.columns.toSeq == ("id" +: (0 until k).map(i => s"h$i")),
      s"signatureAppendSigs: signature columns ${sigs.columns.mkString(",")} " +
        s"do not match the index geometry k=$k")
    // nothing to add (an all-dup or all-sub-n batch — dedupRefresh hits
    // this legitimately): keep the current generation. A zero-row
    // parquet write can land with no part files, and a later manifest
    // read of that segment would fail schema inference.
    if (sigs.isEmpty) return graft.core.IndexGen.current(path).getOrElse(
      throw new IllegalStateException(s"signatureAppend: no committed " +
        s"generation at $path"))
    val (dir, gen) = graft.core.IndexGen.stage(path)
    writeSigMeta(dir, n, k, bands)
    val oldSegs = Similarity.readManifest(cur).getOrElse(
      throw new IllegalStateException(
        s"signatureAppend: no segment manifest in $cur — not a " +
          "signatureSave index"))
    val seg = Similarity.newSegmentName()
    Similarity.writeManifest(dir, oldSegs :+ seg)
    Similarity.writeBinarySegmentTo(sigs, path, seg)
    graft.core.IndexGen.commit(path, gen)
    Similarity.vacuumSegments(path)
    gen
  }

  /** Dedup NEW documents against the persisted history: band-key
    * equi-join of the new docs' banded signatures against the index's
    * (candidate volume bounded by real near-dup structure — no shingle
    * joins, no history scan beyond the one signature-table read), then a
    * signature-agreement Jaccard ESTIMATE over candidates only —
    * est = |{i : hᵢ(new) = hᵢ(old)}| / k, the standard MinHash estimator
    * (exact Jaccard would need history's shingles, which the index
    * deliberately does not store; at production k (≥ 64) the estimate's
    * granularity 1/k is below any useful threshold). Returns
    * (id, dup_of, est_jaccard) for every candidate pair with
    * est ≥ threshold; new docs are NOT deduped among themselves — run
    * [[minhashLshPairs]] on the batch first, that is the in-batch half
    * of the refresh loop. Serves the committed generation (one readDir),
    * so probes keep answering through a concurrent append. */
  def dedupAgainst(spark: org.apache.spark.sql.SparkSession, path: String,
      newDf: DataFrame, id: Column, text: Column,
      threshold: Double = 0.5): DataFrame = {
    val cur = graft.core.IndexGen.readDir(path)
    val (n, k, _) = readSigMeta(cur)
    dedupAgainstSigs(spark, path, cur,
      Caches.eager(minhashInRow(newDf, id, text, n, k)), threshold)
  }

  /** [[dedupAgainst]] over an ALREADY-COMPUTED (and cached) probe
    * signature table (id, h0..h{k-1}) at the index's geometry — shared
    * by the public entry point and [[dedupRefresh]], whose probe also
    * serves the survivor append (one signature pass per refresh, not
    * two). `cur` is the committed generation dir the caller resolved —
    * one readDir per refresh, so probe and append see one generation. */
  private def dedupAgainstSigs(spark: org.apache.spark.sql.SparkSession,
      path: String, cur: String, probe: DataFrame,
      threshold: Double): DataFrame = {
    val (_, k, bands) = readSigMeta(cur)
    val r = k / bands
    val hist = Similarity.codesParts(spark, path, cur)
    val cand = bandRows(probe, bands, r).as("x")
      .join(bandRows(hist, bands, r).as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id"), col("y.id").as("dup_of")).distinct()
    val matches = (0 until k)
      .map(i => when(col(s"h$i") === col(s"g$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(probe, "id")
      .join(hist.select(col("id").as("dup_of") +:
        (0 until k).map(i => col(s"h$i").as(s"g$i")): _*), "dup_of")
      .select(col("id"), col("dup_of"),
        (matches.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The COMPLETE production refresh loop over a persisted signature
    * index, as one call — the composition the incremental pieces exist
    * for. For a day's ingest `batch`:
    *
    *  1. in-batch near-dup canonicalization at the INDEX's (n, k, bands)
    *     geometry ([[canonicalize]] — exact Jaccard ≥ `threshold` on LSH
    *     candidates; the batch's text is in hand, so no estimate needed);
    *  2. history probe ([[dedupAgainst]]): canonical survivors whose
    *     signature agreement with ANY indexed doc reaches `estThreshold`
    *     are dropped (their content is already in the corpus);
    *  3. the remaining genuinely-new documents' signatures are appended
    *     ([[signatureAppend]] — O(survivors), history untouched; sub-n
    *     docs have no signature and are returned but not indexed, the
    *     aggregation form's absent-row rule).
    *
    * Returns the appended survivor rows (the batch's columns). Cost per
    * refresh: one batch-sized LSH pass + one signature-table band join +
    * one O(survivors) append — nothing proportional to history except
    * the single signature-table read, which is what keeps a 100 TB
    * corpus refreshable daily. Single-writer, like every segment store. */
  def dedupRefresh(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, id: Column, text: Column,
      threshold: Double = 0.8, estThreshold: Double = 0.5,
      maxDf: Int = 100): DataFrame = {
    val cur = graft.core.IndexGen.readDir(path)
    val (n, k, bands) = readSigMeta(cur)
    // eager: the canonical survivor set feeds the history probe AND the
    // anti-join return — uncached, each branch re-runs the LSH+CC chain
    val canon = Caches.eager(
      canonicalize(batch, id, text, lit(0), n, k, bands, threshold, maxDf)
        .drop("_cluster"))
    // ONE signature pass per refresh: the probe signatures computed for
    // the history join below are REUSED for the survivor append (a
    // MinHash signature is a pure per-row function at the index's own
    // (n, k), so probe rows semi-joined to the survivor ids ARE
    // minhashInRow(survivors) — the append previously re-ran the whole
    // shingle+minhash kernel over the same texts a second time).
    val probe = Caches.eager(minhashInRow(canon, col("_id"), text, n, k))
    // Replay safety: on a RETRIED batch (append committed, downstream
    // write lost) the index already holds this batch's own signatures,
    // and two in-batch survivors in the est ≥ estThreshold /
    // jaccard < threshold band would each match the OTHER's indexed
    // signature and BOTH drop — silently losing rows from the retried
    // output. History matches must therefore exclude the batch's own
    // ids, not just each row's self-id. A fresh batch's ids are never
    // in the index (the caller-feeds-only-new-ids contract shared by
    // every segment store), so off the replay path this anti-join
    // removes nothing.
    val dupIds = dedupAgainstSigs(spark, path, cur, probe, estThreshold)
      .join(canon.select(col("_id").as("dup_of")), Seq("dup_of"), "left_anti")
      .select(col("id").as("_id")).distinct()
    val survivors = Caches.eager(canon.join(dupIds, Seq("_id"), "left_anti"))
    signatureAppendSigs(spark, path,
      probe.join(survivors.select(col("_id").as("id")), Seq("id"), "left_semi"))
    survivors.select(batch.columns.map(col).toSeq: _*)
  }

  // ------------------------------------------------------------------
  // Incremental EXACT dedup: a persisted content-hash index
  // ------------------------------------------------------------------
  //
  // The exact-dup half of the refresh loop at its cheapest: history at
  // rest is ONE md5 per document (16 bytes of payload vs k hex
  // signatures for the MinHash index), probes are a hash equi-join with
  // the BATCH side broadcast — history is scanned once and never
  // shuffled, the right orientation when |day's ingest| ≪ |corpus|.
  // Near-dup detection needs the signature index ([[signatureSave]]);
  // this one answers only "have I seen exactly this text before", which
  // in crawl pipelines removes the bulk of duplicates before any
  // shingling runs.

  /** Persist an exact-dedup index over a corpus: (id, h = md5(text))
    * under an atomic [[graft.core.IndexGen]] generation with a segment
    * manifest ([[hashAppend]] grows it O(new rows)). NULL-text docs have
    * no hash and are absent (they can never be exact dups). */
  def hashSave(df: DataFrame, id: Column, text: Column,
      path: String): Unit =
    hashSaveHashes(graft.core.Par.spread(df)
      .select(id.as("id"), md5(text).as("h")), path)

  /** [[hashSave]] over an ALREADY-COMPUTED (id, h = md5(text)) table —
    * first-ingest twin of [[hashAppendHashes]]. */
  private[operators] def hashSaveHashes(newHashes: DataFrame,
      path: String): Unit = {
    val hashes = newHashes.toDF("id", "h").filter(col("h").isNotNull)
    val (dir, gen) = graft.core.IndexGen.stage(path)
    writeHashMeta(dir)
    val seg = Similarity.newSegmentName()
    Similarity.writeManifest(dir, Seq(seg)) // manifest-first discipline
    Similarity.writeBinarySegmentTo(hashes, path, seg)
    graft.core.IndexGen.commit(path, gen)
    Similarity.vacuumSegments(path)
  }

  /** Grow a [[hashSave]]d index by the new documents only — O(new rows)
    * compute and I/O, history never re-read; append ≡ rebuild exactly
    * (a content hash is a pure per-document function). Same
    * single-writer / caller-feeds-only-new-ids contract as every
    * segment store. Returns the committed generation. */
  def hashAppend(spark: org.apache.spark.sql.SparkSession, path: String,
      newDf: DataFrame, id: Column, text: Column): Long =
    hashAppendHashes(spark, path, graft.core.Par.spread(newDf)
      .select(id.as("id"), md5(text).as("h")))

  /** [[hashAppend]] over an ALREADY-COMPUTED (id, h = md5(text)) table —
    * the seam for callers whose gate already carries the batch's content
    * hashes (the incremental pretrain chain threads `_h` from its
    * in-batch canonicalization through the gate checkpoint), so the md5
    * kernel is not re-run over the batch text a third time. */
  private[operators] def hashAppendHashes(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newHashes: DataFrame): Long = {
    val cur = graft.core.IndexGen.readDir(path)
    requireHashMeta(cur)
    val hashes = newHashes.toDF("id", "h").filter(col("h").isNotNull)
    // empty/all-NULL batch: keep the current generation (zero-row
    // parquet segments can land without part files — see signatureAppend)
    if (hashes.isEmpty) return graft.core.IndexGen.current(path).getOrElse(
      throw new IllegalStateException(s"hashAppend: no committed " +
        s"generation at $path"))
    val (dir, gen) = graft.core.IndexGen.stage(path)
    writeHashMeta(dir)
    val oldSegs = Similarity.readManifest(cur).getOrElse(
      throw new IllegalStateException(
        s"hashAppend: no segment manifest in $cur — not a hashSave index"))
    val seg = Similarity.newSegmentName()
    Similarity.writeManifest(dir, oldSegs :+ seg)
    Similarity.writeBinarySegmentTo(hashes, path, seg)
    graft.core.IndexGen.commit(path, gen)
    Similarity.vacuumSegments(path)
    gen
  }

  /** Exact-dedup NEW documents against the persisted history: every new
    * doc whose md5(text) equals an indexed doc's comes back as
    * (id, dup_of) — one pair per matching history doc. When the probe
    * fits (≤ `broadcastLimitBytes` of MATERIALIZED cache, measured from
    * the in-memory relation's own stats — not a row-count proxy, which
    * wide id columns defeat), the probe side BROADCASTS (|batch| ≪
    * |corpus| is the refresh-loop shape), so the history hash table is
    * scanned once and never shuffled at any corpus size; an oversized
    * probe falls back to a plain equi-join (shuffled both sides)
    * instead of blowing Spark's 8 GB broadcast hard limit / driver
    * memory on an unconditional hint. The probe is cached and counted
    * in ONE job, so `newDf` is evaluated once either way. Serves the
    * committed generation (one readDir), so probes keep answering
    * through a concurrent append. */
  def exactAgainst(spark: org.apache.spark.sql.SparkSession, path: String,
      newDf: DataFrame, id: Column, text: Column,
      broadcastLimitBytes: Long = 512L << 20): DataFrame =
    exactAgainstHashes(spark, path,
      newDf.select(id.as("id"), md5(text).as("h")), broadcastLimitBytes)

  /** [[exactAgainst]] over an ALREADY-COMPUTED (id, h = md5(text)) probe
    * — the seam for callers that carry the batch's content hashes from
    * their own in-batch exact gate (the incremental pretrain chain, the
    * DocStore exact gate), so the md5 kernel runs once per batch instead
    * of once per gate stage. Same broadcast gating and caching. */
  private[operators] def exactAgainstHashes(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newHashes: DataFrame,
      broadcastLimitBytes: Long = 512L << 20): DataFrame = {
    val cur = graft.core.IndexGen.readDir(path)
    requireHashMeta(cur)
    val hist = Similarity.codesParts(spark, path, cur)
    val probe = Caches.cache(
      newHashes.toDF("id", "h").filter(col("h").isNotNull))
    probe.count() // ONE job: the count IS the cache materialization
    // gate the hint on MEASURED cached bytes (the in-memory relation's
    // own stats) — a row-count proxy is defeated by wide id columns
    val bytes = probe.queryExecution.optimizedPlan.stats.sizeInBytes
    val probeSide =
      if (bytes <= BigInt(broadcastLimitBytes)) broadcast(probe) else probe
    hist.select(col("id").as("dup_of"), col("h"))
      .join(probeSide, Seq("h"))
      .select(col("id"), col("dup_of"))
  }

  /** Compact a [[signatureSave]]d index's segments into ONE — the
    * maintenance cadence for append-heavy indexes, exactly as
    * [[Similarity.ivfSave]] is the compaction of [[Similarity
    * .ivfAppend]]: a long-running refresh loop ([[dedupRefresh]],
    * [[graft.streaming.Streaming.dedupRefreshStream]]) commits one
    * manifest segment per batch, so after thousands of batches every
    * probe unions thousands of small parquet reads. This rewrites the
    * committed generation's signature table as a single segment under a
    * new atomic generation — same rows, same meta, so probe results are
    * identical (the spec pins it) — WITHOUT the original text: one
    * signature-table read, no re-shingling. Probes keep serving the old
    * generation until the commit rename; appends resume on the
    * compacted manifest. Same single-writer contract as append (don't
    * compact concurrently with an append). Returns the committed
    * generation. */
  def signatureCompact(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = compactIndex(spark, path, "sig_meta.txt")

  /** [[signatureCompact]] for a [[hashSave]]d exact-dedup index. */
  def hashCompact(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = compactIndex(spark, path, "hash_meta.txt")

  private def compactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, metaFile: String): Long = {
    val cur = graft.core.IndexGen.readDir(path)
    val metaSrc = new java.io.File(cur, metaFile)
    require(metaSrc.isFile,
      s"compact: not a $metaFile index — missing ${metaSrc.getPath}")
    require(Similarity.readManifest(cur).isDefined,
      s"compact: no segment manifest in $cur")
    val all = Similarity.codesParts(spark, path, cur)
    // zero-row guard, mirroring signatureAppend/hashAppend: an empty
    // committed table compacted to a zero-row parquet segment can land
    // with no part files, and every later manifest read would fail
    // schema inference — keep the current generation instead
    if (all.isEmpty) return graft.core.IndexGen.current(path).getOrElse(
      throw new IllegalStateException(
        s"compact: no committed generation at $path"))
    val (dir, gen) = graft.core.IndexGen.stage(path)
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.copy(metaSrc.toPath,
      new java.io.File(dir, metaFile).toPath)
    val seg = Similarity.newSegmentName()
    Similarity.writeManifest(dir, Seq(seg)) // manifest-first discipline
    Similarity.writeBinarySegmentTo(all, path, seg)
    graft.core.IndexGen.commit(path, gen)
    Similarity.vacuumSegments(path)
    gen
  }

  private def writeHashMeta(genDir: String): Unit = {
    new java.io.File(genDir).mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(genDir, "hash_meta.txt").toPath, "algo=md5")
    ()
  }

  private def requireHashMeta(genDir: String): Unit =
    require(new java.io.File(genDir, "hash_meta.txt").isFile,
      s"not a hashSave exact-dedup index: missing hash_meta.txt in $genDir")

  private def writeSigMeta(genDir: String, n: Int, k: Int, bands: Int): Unit = {
    new java.io.File(genDir).mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(genDir, "sig_meta.txt").toPath,
      s"n=$n\nk=$k\nbands=$bands")
    ()
  }

  private def readSigMeta(genDir: String): (Int, Int, Int) = {
    val f = new java.io.File(genDir, "sig_meta.txt")
    require(f.isFile, s"not a signature index: missing ${f.getPath}")
    val kv = java.nio.file.Files.readString(f.toPath).split("\n")
      .map(_.trim).filter(_.contains("="))
      .map { l => val Array(a, b) = l.split("=", 2); a -> b.toInt }.toMap
    (kv("n"), kv("k"), kv("bands"))
  }

  /** (band, band-key) rows for an LSH banding of a minhash signature
    * table: ONE projection exploding an array of (band, bk) structs —
    * a per-band union would scan the signature table `bands` times as
    * `bands` separate stages (and, before the cache is materialized,
    * those concurrent stages serialize on the cache's block locks). */
  private def bandRows(mh: DataFrame, bands: Int, r: Int): DataFrame =
    mh.select(col("id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat((0 until r).map(i => col(s"h${b * r + i}")): _*)).as("bk"))
      }: _*)).as("_bb"))
      .select(col("id"), col("_bb.band").as("band"), col("_bb.bk").as("bk"))

  /** MinHash + LSH near-duplicate pairs: shingle → k minhashes → `bands`
    * bands of k/bands rows → candidates share a band key → exact Jaccard
    * ≥ threshold verified on candidates only.
    * Returns (a, b, jaccard) with a < b. */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, k: Int = 6, bands: Int = 3,
      threshold: Double = 0.8, maxDf: Int = 100): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sh = Caches.cache(capShingleDf(shingles(df, id, text, n), Seq("s"), maxDf))
    // cache the signature table: each band projection AND each self-join
    // side would otherwise re-run the k-way min aggregation. Materialize
    // it eagerly (one cheap job — |docs| rows): the self-join and the
    // verification join each reference these caches from several stages
    // that AQE runs CONCURRENTLY, and tasks of a not-yet-materialized
    // cached partition serialize on its block lock (measured 370 s of
    // task time for 79 s of CPU at sf0.1 before this).
    val mh = Caches.eager(minhash(sh, k))
    val bb = bandRows(mh, bands, r)
    val cand = bb.as("x")
      .join(bb.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    verifyJaccard(cand, sh, threshold)
  }

  /** Blocked exact n-gram Jaccard: all pairs within a block (equi-join on
    * block + shingle — no cross join), jaccard ≥ threshold.
    * Returns (a, b, jaccard). */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      block: Column, n: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 100): DataFrame = {
    // cache: referenced 4× below (both join sides + both size lookups) —
    // uncached, Catalyst re-derives the explode+distinct each time
    val sh = Caches.cache(capShingleDf(
        shingles(df, id, text, n, carry = Seq(block.as("_blk"))),
        Seq("_blk", "s"), maxDf))
    val inter = sh.as("x").join(sh.as("y"),
        col("x._blk") === col("y._blk") && col("x.s") === col("y.s") &&
          col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("i"))
    finishJaccard(inter, sh.groupBy("id").agg(count(lit(1)).as("n")), threshold)
  }

  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame =
    verifyJaccard2(cand, sh, sh, threshold)

  /** Exact-Jaccard verification of (a, b) candidates against (possibly
    * distinct) shingle tables for each side — the one implementation
    * behind the self-dedup path and [[fuzzyJoin]]'s cross-table path. */
  private def verifyJaccard2(cand: DataFrame, shA: DataFrame, shB: DataFrame,
      threshold: Double): DataFrame = {
    // pin the verification join's parallelism: the candidate list is a
    // few KB after LSH, AQE coalesces it to one partition, and the
    // |cand|·shinglesPerDoc expansion would run single-threaded
    val inter = Similarity.fanoutRepartition(cand, col("a"))
      .join(shA.as("sa"), col("a") === col("sa.id"))
      .join(shB.as("sb"), col("b") === col("sb.id") && col("sa.s") === col("sb.s"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    finishJaccard2(inter,
      shA.groupBy("id").agg(count(lit(1)).as("n")),
      shB.groupBy("id").agg(count(lit(1)).as("n")), threshold)
  }

  private def finishJaccard(inter: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame =
    finishJaccard2(inter, sizes, sizes, threshold)

  private def finishJaccard2(inter: DataFrame, sizesA: DataFrame,
      sizesB: DataFrame, threshold: Double): DataFrame =
    inter
      .join(sizesA.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizesB.select(col("id").as("b"), col("n").as("nb")), "b")
      .withColumn("jaccard",
        col("i") * lit(1.0) / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))

  /** Fuzzy join (reference: stdlib/ml/smart_table_ops/_fuzzy_join.py):
    * match left rows to right rows by text similarity — MinHash/LSH
    * candidates across the two tables, exact-Jaccard verified, best match
    * per left row. Returns (a=left id, b=right id, jaccard). */
  def fuzzyJoin(left: DataFrame, lid: Column, ltext: Column,
      right: DataFrame, rid: Column, rtext: Column,
      n: Int = 3, k: Int = 6, bands: Int = 3,
      threshold: Double = 0.5, maxDf: Int = 100): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val shL = Caches.cache(capShingleDf(shingles(left, lid, ltext, n), Seq("s"), maxDf))
    val shR = Caches.cache(capShingleDf(shingles(right, rid, rtext, n), Seq("s"), maxDf))
    // eager-materialize the signature caches (see minhashLshPairs for why)
    val mhL = Caches.eager(minhash(shL, k))
    val mhR = Caches.eager(minhash(shR, k))
    val cand = bandRows(mhL, bands, r).as("x").join(bandRows(mhR, bands, r).as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    val pairs = verifyJaccard2(cand, shL, shR, threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("jaccard").desc, col("b").asc)
    pairs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Near-duplicate CANONICALIZATION — the "actually remove the dups"
    * pipeline op: [[minhashLshPairs]] edges → connected components → one
    * representative per cluster (max `keepBy`, ties to the smallest id).
    * Returns the kept rows with their `_cluster` label (= min member
    * id); singletons keep themselves.
    *
    * Scale shape: pairs are LSH-banded equi-joins (never all-pairs), CC
    * is pointer-jumping (log(diameter) rounds over near-dup clusters,
    * which are tiny by construction), and the representative pick is ONE
    * struct-max aggregate — no window sort over the corpus.
    *
    * `df` is consumed TWICE (once into the shingle table, once for the
    * cluster join-back). A raw parquet scan is cheap to evaluate twice;
    * a caller whose `df` is an expensive derived frame (a pipeline
    * stage) should cache/eager it first — see
    * [[Pipelines.pretrainCorpusFull]]'s near-dup branch. */
  def canonicalize(df: DataFrame, id: Column, text: Column, keepBy: Column,
      n: Int = 3, k: Int = 6, bands: Int = 3,
      threshold: Double = 0.8, maxDf: Int = 100): DataFrame = {
    val pairs = minhashLshPairs(df, id, text, n, k, bands, threshold, maxDf)
    val cc = Graphs.connectedComponents(
      pairs.select(col("a").as("src"), col("b").as("dst")))
    val docs = df.withColumn("_id", id)
    val clustered = docs.join(cc, docs("_id") === cc("node"), "left")
      .withColumn("_cluster", coalesce(col("comp"), col("_id")))
      .drop("node", "comp")
    ColUtils.argmaxRows(clustered, Seq(col("_cluster")), keepBy, col("_id"))
  }

  /** Winnowed CONTAINMENT pairs (the MOSS report step over
    * [[TextOps.winnowFingerprints]] sketches): document pairs whose
    * sketches overlap heavily relative to the SMALLER sketch —
    * containment |A∩B| / min(|A|,|B|) — which catches a short document
    * pasted verbatim inside a long one, where Jaccard (union-normalized)
    * stays arbitrarily low. The winnowing guarantee makes the sketch
    * join sound: any shared run of ≥ w+k−1 tokens contributes a shared
    * fingerprint, so real containment can't silently miss.
    *
    * Scale shape: candidates come from an equi-join on fingerprint hash
    * over sketches that are ~2/(w+1) the size of the shingle tables the
    * Jaccard pipelines join — winnowing IS the sketch-size dial.
    * `maxDf` drops fingerprints shared by more than maxDf docs
    * (boilerplate; same quadratic-cost argument as [[capShingleDf]]).
    * Sketch sizes count distinct hashes and are measured BEFORE the
    * cap, so a hot fingerprint weakens candidate generation, never the
    * score's denominator. Returns (a, b, containment) with a < b. */
  def containmentPairs(df: DataFrame, id: Column, text: Column,
      k: Int = 4, w: Int = 4, threshold: Double = 0.5,
      maxDf: Int = 100): DataFrame = {
    val fp = Caches.cache(
      TextOps.winnowFingerprints(df, id, text, k, w)
        .select(col("id"), col("fp").as("s")).distinct())
    val sizes = fp.groupBy("id").agg(count(lit(1)).as("n"))
    val capped = capShingleDf(fp, Seq("s"), maxDf)
    val inter = capped.as("x").join(capped.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .withColumn("containment",
        col("i") * lit(1.0) / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select(col("a"), col("b"), col("containment"))
  }

  /** SimHash fingerprint (16-bit, word-multiset weighted): bit j is the
    * sign of Σ_words ±1 where ± comes from bit j of md5(word). Near-dups
    * collide on the fingerprint (or within small Hamming distance).
    * Returns (id, simhash). Pure aggregates — one shuffle. */
  def simhash16(df: DataFrame, id: Column, text: Column): DataFrame = {
    val w = df.select(id.as("id"), explode(split(text, " ")).as("word"))
      .withColumn("v", conv(substring(md5(col("word")), 1, 4), 16, 10).cast("int"))
    val bitSums = (0 until 16).map(j =>
      sum(shiftright(col("v"), j).bitwiseAND(1) * 2 - 1).as(s"s$j"))
    w.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 16).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Exact duplicated-SPAN detection between document pairs (the
    * substring-level dedup of Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better" — their suffix-array pass finds
    * verbatim repeated sequences; this is the distributed shingle-join
    * twin): maximal runs of ≥ `minSpan` tokens shared verbatim between
    * two documents, reported with both start positions, e.g. to excise
    * boilerplate or quote-duplication instead of dropping whole docs.
    *
    *  - positional n-gram shingles (md5 keys) equi-join across docs —
    *    never a cross join; `maxDf` drops boilerplate shingles that
    *    would make hot keys quadratic (same cap contract as
    *    [[capShingleDf]], distinct-doc frequency);
    *  - a shared span of L tokens is L−n+1 consecutive shingle matches
    *    on one DIAGONAL (pa − pb constant); islands are found with the
    *    classic gaps-and-islands trick (pa − row_number per diagonal),
    *    one window + one aggregate, both shuffled by (a, b) pair;
    *  - overlapping repeats within one doc surface as separate
    *    diagonals, matching the suffix-array semantics.
    *
    * Returns (a, b, a_start, b_start, span_tokens), a < b, 1-based
    * token positions. */
  def duplicateSpans(df: DataFrame, id: Column, text: Column,
      n: Int = 5, minSpan: Int = 10, maxDf: Int = 8): DataFrame = {
    require(n > 0 && minSpan >= n, s"duplicateSpans: need minSpan >= n")
    // positional shingles: posexplode the one-pass shingle array (pos is
    // 0-based → +1 restores the 1-based sequence positions), md5 AFTER
    // the Generate barrier so each shingle hashes exactly once
    val ps = Caches.cache(graft.core.Par.spread(df)
      .select(id.as("id"),
        posexplode(graft.plans.TextExprs.shingles(text, n, distinct = false))
          .as(Seq("_p0", "_s")))
      .select(col("id"), (col("_p0") + 1).as("p"), md5(col("_s")).as("k")))
    val hot = ps.groupBy("k").agg(countDistinct(col("id")).as("_df"))
      .filter(col("_df") > maxDf).select("k")
    val pc = Similarity.fanoutRepartition(
      ps.join(broadcast(hot), Seq("k"), "left_anti"), col("k"))
    val m = pc.select(col("id").as("a"), col("p").as("pa"), col("k"))
      .join(pc.select(col("id").as("b"), col("p").as("pb"), col("k")), Seq("k"))
      .filter(col("a") < col("b"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a"), col("b"), col("pa") - col("pb")).orderBy("pa")
    m.withColumn("g", col("pa") - row_number().over(wd))
      .groupBy(col("a"), col("b"), (col("pa") - col("pb")).as("_d"), col("g"))
      .agg(min(col("pa")).as("a_start"), min(col("pb")).as("b_start"),
        (count(lit(1)) + lit(n - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .select(col("a"), col("b"), col("a_start"), col("b_start"),
        col("span_tokens"))
  }

  /** Excise duplicated spans from the LATER document of each pair
    * (completes [[duplicateSpans]] the way Lee et al. use it: cut the
    * repeated sequence out of one copy instead of dropping whole
    * documents — boilerplate and quotes go, unique content stays).
    *
    * `spans` is [[duplicateSpans]] output; for every (a, b, …, b_start,
    * span_tokens) row, tokens [b_start, b_start+span_tokens) of doc `b`
    * are dropped (the a-side copy survives — a < b, so exactly one copy
    * of every duplicated span remains corpus-wide). Overlapping spans
    * union naturally through the anti-join. Token-level rebuild: output
    * text re-joins kept tokens with single spaces.
    *
    * Scale shape: tokens anti-join spans on (doc equi-key + position
    * range) — hash-join keyed by doc id with the range as a residual
    * predicate, never a cartesian; re-assembly is one aggregate shuffled
    * by doc. Returns (id, text, n_tokens) for EVERY input doc
    * (fully-excised docs come back with empty text, n_tokens 0). */
  def exciseSpans(df: DataFrame, id: Column, text: Column,
      spans: DataFrame): DataFrame = {
    val docs = graft.core.Par.spread(df).select(id.as("id"), text.as("_text"))
    val toks = docs
      .select(col("id"), posexplode(split(col("_text"), " ")).as(Seq("p0", "w")))
      .select(col("id"), (col("p0") + 1).as("p"), col("w"))
    val sp = spans.select(col("b").as("_sid"), col("b_start"),
      (col("b_start") + col("span_tokens")).as("_send"))
    val kept = toks.join(sp,
      toks("id") === sp("_sid") && toks("p") >= sp("b_start") &&
        toks("p") < sp("_send"), "left_anti")
    val rebuilt = kept.groupBy("id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("p"), col("w")))),
          e => e.getField("w")), " ").as("text"),
        count(lit(1)).as("n_tokens"))
    docs.select(col("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Embedding near-duplicate pairs within a block: cosine ≥ threshold.
    * Candidate generation = equi-join on the block column (use an LSH
    * bucket — [[Similarity.rhpBucket]] — as the block at scale).
    * Vectors are folded in-order in double precision. */
  def embeddingPairs(df: DataFrame, id: Column, vec: Column, block: Column,
      threshold: Double, dim: Int = 0): DataFrame = {
    val v0 = Caches.eager(Similarity.spread(df)
      .select(id.as("id"), vec.cast("array<double>").as("v"),
        block.as("_blk"))
      .withColumn("_n2", Similarity.norm2(col("v"), dim)))
    // pin the per-block pairwise expansion's parallelism
    val v = Similarity.fanoutRepartition(v0, col("_blk"))
    v.as("x").join(v.as("y"),
        col("x._blk") === col("y._blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        Similarity.cosinePrenorm(col("x.v"), col("y.v"),
          col("x._n2"), col("y._n2"), dim).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SEMANTIC benchmark decontamination — the embedding-space twin of
    * [[decontaminate]]'s exact n-gram rule (the paraphrase leak n-grams
    * can't see: an eval item reworded into the training set shares no
    * 5-gram but sits next to it in embedding space). A train row is
    * dropped when ANY held-out vector has cosine ≥ `tau` with it.
    *
    * Scale shape: held-out benchmark sets are SMALL by construction
    * (thousands of rows against a corpus of billions), so the held-out
    * side broadcasts and the whole filter is one corpus scan — a
    * broadcast nested-loop ANTI join whose inner loop is |heldout|
    * cosines per row, no shuffle, no pairwise corpus expansion. Returns
    * the surviving train rows (id column only — join back for payload). */
  def decontaminateSemantic(train: DataFrame, heldout: DataFrame,
      id: Column, vec: Column, tau: Double, dim: Int = 0): DataFrame = {
    val t = Similarity.spread(train)
      .select(id.as("id"), vec.cast("array<double>").as("v"))
      .withColumn("_n2", Similarity.norm2(col("v"), dim))
    // _hn2 > 0: a degenerate (zero-norm or NULL) held-out vector yields
    // cosine NaN against EVERY train row, and NaN >= tau is TRUE under
    // Spark's NaN-greatest ordering — one such row would silently empty
    // the whole training corpus through the anti join. Cosine to a
    // zero vector is undefined, so it contaminates nothing.
    val h = heldout.select(vec.cast("array<double>").as("_hv"))
      .withColumn("_hn2", Similarity.norm2(col("_hv"), dim))
      .filter(col("_hn2") > 0)
    // symmetrically, `_n2 > 0` in the condition: a zero-norm TRAIN row's
    // NaN cosine must not count as a contamination match (it survives —
    // degenerate vectors are a quality-filter concern, not a leak)
    t.join(broadcast(h),
        col("_n2") > 0 &&
          Similarity.cosinePrenorm(col("v"), col("_hv"),
            col("_n2"), col("_hn2"), dim) >= tau,
        "left_anti")
      .select(col("id"))
  }
}
