package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language-ID scoring,
  * quality metrics, token counting, document fingerprinting.
  *
  * Everything is a pure Column expression (codegen'd, pushdown-friendly);
  * nothing leaves the row, so these scale embarrassingly — the cost at
  * 100 TB is exactly one scan.
  */
object TextOps {

  /** Whitespace token list. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Wordish token count via regex (a BPE-ish lower bound — runs of
    * letters; punctuation and digits split). */
  def wordTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+"), lit(0))).cast("long")

  /** Distinct-token ratio — low values indicate boilerplate/repetition. */
  def distinctRatio(text: Column): Column =
    size(array_distinct(tokens(text))) * lit(1.0) / size(tokens(text))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    (length(text) - size(tokens(text)) + 1) * lit(1.0) / size(tokens(text))

  /** Fraction of tokens found in `lexicon`. */
  def lexiconRatio(text: Column, lexicon: Seq[String]): Column = {
    val lex = array(lexicon.map(lit): _*)
    size(filter(tokens(text), w => array_contains(lex, w))) * lit(1.0) /
      size(tokens(text))
  }

  /** Composite quality score in [0,1]: mixes length, distinctness and
    * stopword presence — the usual cheap pre-filter before expensive
    * dedup/model scoring. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text) / lit(500.0), lit(1.0))
    val stopScore = least(lexiconRatio(text, stopwords) * 5.0, lit(1.0))
    (lenScore + stopScore + distinctRatio(text)) / 3.0
  }

  /** Language-ID by marker-lexicon scoring: argmax over languages of the
    * marker-hit ratio, ties broken by language code. A character-n-gram
    * model is the production variant; the scoring/argmax plumbing is
    * identical. */
  def langId(text: Column, markers: Map[String, Seq[String]]): Column = {
    // struct(score, negated-lang) max ≡ (max score, tie → smallest lang)
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, lex) =>
      struct(lexiconRatio(text, lex).as("score"), lit(lang).as("lang"))
    }
    // greatest by score then FIRST lang alphabetically on ties: compare
    // (score, reversed lang) — flip lang ordering by negating bytes is
    // messy; instead fold manually keeping strict-greater wins
    scored.reduceLeft { (best, cand) =>
      when(cand.getField("score") > best.getField("score"), cand).otherwise(best)
    }.getField("lang")
  }

  /** Content fingerprint: md5 of the sorted distinct token set — robust
    * to word order, the cheapest "same bag of words" detector. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Winnowing-style min-hash fingerprint: the minimum md5 over word
    * n-gram shingles (rolling-hash family; deterministic). */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    // shingles() is the transform's INPUT (evaluated once), and the
    // lambda only touches its own variable — no producer re-evaluation
    array_min(transform(
      graft.plans.TextExprs.shingles(text, n, distinct = false), s => md5(s)))

  /** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken 2003 —
    * the MOSS local-fingerprinting algorithm): hash every k-token
    * shingle, slide a w-hash window over the hash sequence, and in each
    * window select the minimum hash (ties → RIGHTMOST occurrence, the
    * paper's density rule); the distinct selected (position, hash) pairs
    * are the document's sketch. Guarantees the single global min of
    * [[minShingleFingerprint]] cannot give: every shared token run of
    * ≥ w + k − 1 tokens between two documents shares at least one
    * fingerprint HASH, and no run shorter than k tokens ever matches.
    * Expected sketch density ≈ 2/(w+1) of the shingle count.
    *
    * One native plan node per row ([[graft.plans.WinnowExpr]]: split
    * once, hash each shingle once, tight O(shingles·w) windowed-argmin
    * loop) — so fingerprinting is shuffle-free, one scan at any corpus
    * size. The earlier nested-HOF formulation was quadratic-plus in
    * practice: Catalyst inlines producing projections into lambda
    * references, so every window element re-derived the whole hash
    * array and every hash re-split the text (see WinnowExpr's
    * scaladoc). Documents shorter than k tokens carry no fingerprints;
    * when the shingle count is below w the single truncated window is
    * winnowed whole. Returns (id, pos, fp) — pos is the 1-based shingle
    * position of the selected hash, kept so containment hits can be
    * anchored to spans. */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, k: Int = 4, w: Int = 4): org.apache.spark.sql.DataFrame =
    graft.core.Par.spread(df)
      .select(id.as("id"),
        explode(graft.plans.TextExprs.winnow(text, k, w)).as("_s"))
      .select(col("id"), col("_s.pos").as("pos"), col("_s.fp").as("fp"))

  /** Corpus vocabulary: per-token term frequency + document frequency in
    * one pass (explode → single groupBy; both aggregates partial
    * map-side except the distinct, which Spark expands to a two-phase
    * aggregate on (token, id) — still one logical shuffle family, no
    * window). The seed table for stopword discovery, BPE merges, df
    * caps. Call on a DataFrame, not a Column: it aggregates the corpus. */
  def vocabulary(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame =
    df.select(id.as("_id"), explode(tokens(text)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("_id")).as("df"))

  /** Per-token unigram log-probabilities under the corpus's own unigram
    * model — the CCNet/Gopher-style perplexity proxy for quality
    * filtering (docs of high-frequency tokens score high; gibberish and
    * rare-token soup score low). Two aggregations over one token
    * explode: vocab counts (shuffle by token — the scalable join key at
    * any corpus size) and the grand total (one broadcast row). Returns
    * (id, token, lp) with lp = ln(tf/total); average per id for a
    * document score (use an exact decimal sum if the result must be
    * engine-reproducible — see QueryModule.dsum). */
  def unigramTokenLogProbs(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    val tok = df.select(id.as("id"), explode(tokens(text)).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("tf"))
    val total = vocab.agg(sum(col("tf")).as("total"))
    tok.join(vocab, "token")
      .crossJoin(org.apache.spark.sql.functions.broadcast(total))
      .select(col("id"), col("token"),
        log(col("tf").cast("double") / col("total")).as("lp"))
  }

  /** Document-level unigram quality score: mean token log-probability
    * (higher = more typical text) plus the token count. */
  def unigramScore(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame =
    unigramTokenLogProbs(df, id, text).groupBy("id")
      .agg(avg(col("lp")).as("logprob"), count(lit(1)).as("n_tok"))

  /** Per-bigram log-probabilities under the corpus's own add-k-smoothed
    * bigram model — the next step up from [[unigramTokenLogProbs]]
    * toward the CCNet 5-gram-LM quality filter: word-order gibberish
    * that unigram statistics can't see (shuffled text has identical
    * unigram counts) scores low here.
    *
    * P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V), V = corpus vocabulary
    * size. Three aggregations over one bigram explode (by (w1,w2), by
    * w1, and the scalar V — all map-side combinable, shuffled by the
    * join keys they feed), then one join back; no window, no driver
    * state. Docs with < 2 tokens emit no rows. Returns (id, lp);
    * average per id for a document score (exact decimal sum for
    * engine-reproducible results — QueryModule.dsum).
    *
    * Skew: the join back on `w1` (and on hot bigrams) concentrates head
    * words — "the" can carry percents of a natural-language corpus. Each
    * bg row matches exactly ONE count row, so there is no fanout, but
    * the shuffle partition holding a head word is the straggler. AQE's
    * skew-join split handles sort-merge plans at runtime; when it isn't
    * available/enough, pass `saltBuckets` > 0 to route both count joins
    * through the deterministic salting recipe of
    * [[graft.core.Table.joinSalted]]: the bg side salts on a row hash,
    * the (small) count tables replicate once per salt, and the hot key
    * spreads over `saltBuckets` tasks. Output rows are IDENTICAL either
    * way (SkewSpec pins it) — salting changes the partitioning, never
    * the join result. */
  def bigramLogProbs(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, k: Double = 0.5,
      saltBuckets: Int = 0): org.apache.spark.sql.DataFrame = {
    val w = df.select(id.as("id"), text.as("_t"))
    // one-pass bigram build; tokens are space-split so a bigram string
    // contains exactly one space — substring_index recovers the halves
    val bg = w.select(col("id"),
        explode(graft.plans.TextExprs.shingles(col("_t"), 2, distinct = false))
          .as("g"))
      .select(col("id"), substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vs = w.select(explode(tokens(col("_t"))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val joined =
      if (saltBuckets <= 0) bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      else {
        val rep = (d: org.apache.spark.sql.DataFrame) => d.withColumn("_salt",
          explode(sequence(lit(0), lit(saltBuckets - 1))))
        bg.withColumn("_salt",
            pmod(xxhash64(col("id").cast("string"), col("w2")),
              lit(saltBuckets)).cast("int"))
          .join(rep(c2), Seq("w1", "w2", "_salt"))
          .join(rep(c1), Seq("w1", "_salt"))
          .drop("_salt")
      }
    joined.crossJoin(org.apache.spark.sql.functions.broadcast(vs))
      .select(col("id"),
        log((col("c2") + lit(k)) / (col("c1") + lit(k) * col("v"))).as("lp"))
  }

  /** Corpus-frequency boilerplate removal (the MassiveText/C4 repeated-
    * line rule: a line occurring across many documents is template
    * boilerplate — nav bars, cookie banners, license headers — and is
    * excised from EVERY document, complementing [[graft.operators.Dedup]]'s
    * span excision which only cuts within candidate pairs). A segment
    * (split by the literal `separator`) whose exact text appears in
    * `minDocs` or more DISTINCT documents is dropped; survivors re-join
    * in original order. Returns (id, text, n_dropped).
    *
    * Scale shape: one explode → one distinct + count per segment text
    * (both map-side combinable, linear in corpus tokens) → the
    * boilerplate set is broadcast by construction (segments above a
    * many-documents threshold are FEW — that's what makes them
    * boilerplate) into a left anti-ish mark join → one groupBy(id)
    * reassembly. Nothing pairwise, nothing corpus-quadratic; hot
    * segments concentrate only into the count aggregate, where the
    * partial combine absorbs them. */
  def dropBoilerplate(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, separator: String,
      minDocs: Long): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"dropBoilerplate: minDocs must be >= 2, got $minDocs")
    val quoted = java.util.regex.Pattern.quote(separator)
    // coalesce: split(NULL) explodes to ZERO rows, so a NULL-text doc
    // would silently vanish from the output (it never reaches the
    // groupBy) — every input id must survive; NULL text reads as the
    // empty document and comes back as text = '' (or is excised like
    // any segment if '' itself crosses the boilerplate threshold)
    val segs = df.select(id.as("id"),
      posexplode(split(coalesce(text, lit("")), quoted))
        .as(Seq("pos", "seg")))
    val boiler = broadcast(
      segs.select(col("id"), col("seg")).distinct()
        .groupBy("seg").agg(count(lit(1)).as("_df"))
        .filter(col("_df") >= minDocs).select(col("seg")))
    segs.join(boiler.withColumn("_b", lit(true)), Seq("seg"), "left")
      .groupBy("id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("_b").isNull,
            struct(col("pos"), col("seg"))))),
          e => e.getField("seg")), separator).as("text"),
        sum(when(col("_b").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
  }

  // -- cleaning / PII masking ---------------------------------------------
  // Patterns are restricted to syntax RE2 and java.util.regex agree on
  // (character classes, \s/\S, bounded quantifiers — no lookaround, no
  // backrefs) so the DuckDB oracle replays them verbatim (with the 'g'
  // flag: DuckDB's regexp_replace is first-match-only by default, Spark's
  // is global).

  /** Drop URLs (http/https through the next whitespace). */
  def stripUrls(text: Column): Column =
    regexp_replace(text, "https?://\\S+", " ")

  /** Mask email addresses with `<EMAIL>`. */
  def maskEmails(text: Column): Column =
    regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  /** Mask dotted-quad IPv4 literals with `<IP>`. */
  def maskIpv4(text: Column): Column =
    regexp_replace(text,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>")

  /** Collapse whitespace runs to single spaces and trim. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Standard pre-training scrub: strip URLs, mask emails and IPv4s,
    * normalize whitespace. Order matters — URL removal first (URLs can
    * embed @ and dotted quads), whitespace collapse last. Pure
    * projection: one scan at any corpus size. */
  def cleanText(text: Column): Column =
    normalizeWhitespace(maskIpv4(maskEmails(stripUrls(text))))

  /** Blocklist term matching — the bad-word/license-string/marker scan
    * of a training-data filter: the DISTINCT `terms` occurring as
    * substrings of `text`, in term-list order
    * ([[graft.plans.MultiMatchExpr]] — ONE Aho–Corasick pass per row,
    * O(|text| + hits) however long the list, where a `LIKE any` /
    * regex-alternation formulation scales O(|text|·|terms|)). Exact-
    * case substring semantics; normalize upstream for word boundaries
    * or case folding. */
  def matchTerms(text: Column, terms: Seq[String]): Column =
    graft.plans.TextExprs.matchTerms(text, terms)

  /** Keep only rows whose `text` matches NO blocklist term — the filter
    * composition of [[matchTerms]]; a pure scan at any corpus size. */
  def blocklistFilter(df: org.apache.spark.sql.DataFrame, text: Column,
      terms: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(size(matchTerms(text, terms)) === 0)

  /** Gopher/MassiveText-style repetition signals (the published
    * "repetitive content" filter family): per document, the fraction of
    * all tokens taken by the single most frequent unigram and bigram —
    * high values mark boilerplate, keyword-stuffing and spam.
    *
    * Deliberately a DataFrame op, not a per-row array fold: the mode of
    * a token multiset via higher-order functions is O(len²) interpreted
    * per row, while explode → two-level aggregate is the same
    * map-side-combinable shingle shape the dedup pipeline scales on.
    * Returns (id, n_tokens, top_unigram_frac, top_bigram_frac);
    * single-word documents carry a NULL bigram fraction. */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    val w = df.select(id.as("id"), text.as("_t"))
    val uni = w.select(col("id"), explode(tokens(col("_t"))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("c1"), sum(col("c")).as("n1"))
    val bi = w.select(col("id"),
        explode(graft.plans.TextExprs.shingles(col("_t"), 2, distinct = false))
          .as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("c2"), sum(col("c")).as("n2"))
    uni.join(bi, Seq("id"), "left")
      .select(col("id"), col("n1").as("n_tokens"),
        (col("c1") * lit(1.0) / col("n1")).as("top_unigram_frac"),
        (col("c2") * lit(1.0) / col("n2")).as("top_bigram_frac"))
  }

  /** Overlapping token-window chunking (training/RAG corpus prep):
    * windows of `chunkSize` words advancing by `chunkSize - overlap`;
    * the final partial window is kept. Pure array expressions — the
    * explode is the only row expansion, no UDF, so a 100 TB corpus
    * chunks in one scan. Returns (id, chunk_id, chunk). */
  def chunk(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      chunkSize: Int, overlap: Int): org.apache.spark.sql.DataFrame =
    chunkKeep(df, id, text, chunkSize, overlap, Nil)

  /** [[chunk]] with pass-through columns: `keep` names columns of `df`
    * carried onto every chunk row unchanged (metadata traveling with its
    * chunks — the DocStore pipeline's shape). Same single-scan
    * explode-only plan; the passthrough avoids a chunk-level join back to
    * the document table, which at corpus scale is a full extra shuffle of
    * the (much larger) chunk set. */
  def chunkKeep(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      chunkSize: Int, overlap: Int,
      keep: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && chunkSize > overlap,
      s"chunk: need 0 <= overlap < chunkSize, got $chunkSize/$overlap")
    val step = chunkSize - overlap
    val w = df.select(id.as("id") +: tokens(text).as("ws") +: keep.map(col): _*)
    val starts = sequence(lit(1),
      greatest(size(col("ws")) - lit(overlap), lit(1)), lit(step))
    w.select(col("id") +: posexplode(starts).as(Seq("chunk_id", "s")) +:
        col("ws") +: keep.map(col): _*)
      .select(col("id") +: col("chunk_id").cast("long").as("chunk_id") +:
        concat_ws(" ", slice(col("ws"), col("s"), lit(chunkSize))).as("chunk") +:
        keep.map(col): _*)
  }

  /** Separator-aware chunking (the RecursiveSplitter/markdown-splitter
    * family of the reference's xpack: split on a STRUCTURAL boundary —
    * paragraph, sentence, heading — then pack whole pieces into chunks
    * under a token budget, never cutting a piece mid-window the way
    * [[chunk]]'s fixed windows do).
    *
    * Deterministic budget-bucketing twin of greedy packing: piece p
    * (in document order, token count t_p) lands in chunk
    * floor(Σ_{q<p} t_q / maxTokens) — a pure prefix-sum rule, so the
    * whole operator is one explode + one integer running-sum window +
    * one group-by, replayable in any engine (strict greedy packing needs
    * a sequential carry loop; the bucket rule differs only in that a
    * piece straddling a boundary joins the chunk its PREFIX sum selects,
    * and chunks can exceed maxTokens by at most one piece — the same
    * tolerance greedy has). Oversized single pieces become their own
    * oversized chunk, as in the reference splitters. Returns
    * (id, chunk_id, n_pieces, n_tokens, chunk) + `keep` passthrough;
    * chunk text re-joins its pieces with the separator. */
  def chunkBySeparator(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, separator: String, maxTokens: Int,
      keep: Seq[String] = Nil): org.apache.spark.sql.DataFrame =
    // One native plan node per row ([[graft.plans.ChunkBySepExpr]]:
    // split once, count once, one grouping pass — O(pieces + output)),
    // then the explode is the only row expansion. Shuffle-FREE — unlike
    // the obvious window-function formulation (shuffle by doc id,
    // running sum, group-by) — one scan at any corpus size, and the
    // stateless plan runs under Structured Streaming (windows are
    // unsupported there), which is what lets the DocStore ingest path
    // take a splitter. Two earlier array-expression formulations were
    // both quadratic in practice: Catalyst inlines producing projections
    // into lambda references, so per-piece bucket lookups re-ran the
    // whole prefix fold (see ChunkBySepExpr's scaladoc).
    df.select(id.as("id") +:
        explode(graft.plans.TextExprs.chunkBySep(text, separator, maxTokens))
          .as("_c") +: keep.map(col): _*)
      .select(col("id") +: col("_c.chunk_id").as("chunk_id") +:
        col("_c.n_pieces").as("n_pieces") +: col("_c.n_tokens").as("n_tokens") +:
        col("_c.chunk").as("chunk") +: keep.map(col): _*)
}
