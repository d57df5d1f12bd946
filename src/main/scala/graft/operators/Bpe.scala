package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Caches

/** Deterministic byte-pair-encoding merge learning + segmentation at
  * corpus scale (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units" — the tokenizer-training half every
  * LLM data pipeline runs before token counting means anything).
  *
  * Shape: the corpus collapses ONCE into a word-frequency vocabulary
  * (one token explode + one groupBy — the only corpus-sized shuffle, at
  * any corpus size), and merge learning then iterates on the VOCABULARY
  * (|unique words| rows, corpus-size-independent) — the standard BPE
  * trainer decomposition. Each round: adjacent symbol pairs weighted by
  * word frequency (one-pass [[graft.plans.ShinglesExpr]] over the
  * space-joined symbol state), one map-side-combinable aggregate, top-1
  * pair to the driver (a single row — the documented driver-side step,
  * like the k-means centroid walk), then one LITERAL string replace
  * applies the merge to every word in parallel. `segment` replays the
  * learned merge list over any corpus as a chain of literal replaces —
  * pure scan, shuffle-free.
  *
  * Determinism (the cross-engine contract): pair counts are exact
  * integers; the round winner is max count with ties broken by
  * (first, second) lexicographic order, so the whole training run is a
  * pure function of the word-frequency table and replays bit-for-bit in
  * DuckDB (the oracle unrolls the rounds as CTEs).
  *
  * Merge application must be GREEDY LEFT-TO-RIGHT non-overlapping
  * (`"a a a"` merging (a,a) → `["aa","a"]`, never `["a","aa"]`). Both
  * Spark's and DuckDB's literal `replace` scan the original string
  * left-to-right and resume after the matched region — exactly that
  * semantics — but a naive single-space joint would make consecutive
  * occurrences SHARE the boundary space and miss the second match. So
  * application doubles the joints first: pad to ` a  b ` form, replace
  * ` a  b ` with ` ab `, collapse back. Symbols never contain spaces
  * (characters and concatenations of characters; the corpus is
  * space-tokenized upstream), so the encoding is unambiguous.
  *
  * Words carry the classic `</w>` end marker, so merges can capture
  * suffixes; [[segment]] keeps the marker on the final piece (strip it
  * downstream if undesired). Reference scope: the reference's pipelines
  * stop at whitespace/regex token counts — this is one of the
  * beyond-the-reference training-data operators (SURVEY §8.10).
  */
object Bpe {

  /** End-of-word marker symbol (never merges with the next word —
    * words are independent rows). */
  val EndOfWord = "</w>"

  /** (word, freq) vocabulary of a corpus — the one corpus-sized
    * aggregation. Empty tokens (double spaces in the raw text) are kept
    * as the empty word, matching the split-with-trailing-empties token
    * recipe used everywhere else. */
  def wordFreqs(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol state of a word: characters space-joined, plus the
    * end marker — `"low"` → `"l o w </w>"`. */
  private def initState(word: Column): Column =
    // the empty word (double spaces upstream) is just the marker — a
    // concat_ws over its empty char list would leave a leading joint
    when(length(word) === 0, lit(EndOfWord))
      .otherwise(concat_ws(" ",
        concat_ws(" ", regexp_extract_all(word, lit("."), lit(0))),
        lit(EndOfWord)))

  /** One greedy left-to-right merge of the adjacent pair (a, b) applied
    * to a space-joined symbol state (see the scaladoc on joint
    * doubling). */
  private def applyMerge(state: Column, a: String, b: String): Column = {
    val padded = concat(lit(" "), replace(state, lit(" "), lit("  ")), lit(" "))
    val merged = replace(padded, lit(s" $a  $b "), lit(s" $a$b "))
    trim(replace(merged, lit("  "), lit(" ")))
  }

  /** Learn up to `merges` BPE merges from a corpus. Returns the merge
    * table (rank, first, second, merged, pair_count) — rank 0 is the
    * first merge learned. Stops early (fewer rows) when no pair occurs
    * twice.
    *
    * `maxPerRound = 1` (default) is the strict sequential trainer: one
    * Spark job + one single-row collect per MERGE — exact, but a real
    * ~30k-merge tokenizer run at one-job-per-merge cadence is a
    * driver-side bottleneck, the named scale-killer.
    *
    * `maxPerRound > 1` is the standard batched trainer: each round
    * collects the top `maxPerRound·4` pairs once and greedily keeps up
    * to `maxPerRound` of them, in (count desc, pair asc) order, subject
    * to SYMBOL-DISJOINTNESS — a kept pair (c, d) shares no symbol with
    * any earlier-kept (a, b) or its merged form a‖b. Disjointness makes
    * the batch ORDER-EXACT: applying (a, b) can only change counts of
    * pairs touching a, b, or ab, so every later-kept pair's count — and
    * hence its selection — is exactly what the sequential trainer would
    * have seen at its turn. The one divergence from strict-sequential is
    * CHOICE, not application: a merge can create a brand-new pair
    * (x, ab) whose count exceeds a later batch pick's, which sequential
    * would have preferred — so under a FIXED merge budget the two
    * trainers explore the frontier in different order (sequential chains
    * depth-first onto fresh merged symbols, batching breadth-first) and
    * the merge lists genuinely differ. That is the standard fast-BPE
    * trade (job count drops ~maxPerRound×: a 30k-merge run at
    * maxPerRound=256 is ~120 jobs, not 30k); tokenizer quality at real
    * merge budgets is equivalent, and the run remains fully
    * deterministic/cross-engine replayable — the batch rule is a pure
    * function of the round's pair counts.
    *
    * Loop state: the rewritten vocab is |unique words| rows
    * (corpus-size-independent); it is localCheckpoint'ed every
    * [[CheckpointEvery]] rounds so driver-side plan growth stays O(1)
    * per round over long runs (the [[graft.operators.Iterate]]
    * discipline), eager-cached in between. */
  def learnMerges(df: DataFrame, text: Column, rounds: Int,
      maxPerRound: Int = 1): DataFrame = {
    require(rounds > 0, s"bpe: rounds must be > 0, got $rounds")
    require(maxPerRound > 0, s"bpe: maxPerRound must be > 0, got $maxPerRound")
    val spark = df.sparkSession
    var vocab = Caches.eager(
      wordFreqs(df, text).select(col("freq"), initState(col("word")).as("s")))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var round = 0
    var exhausted = false
    while (merges.length < rounds && !exhausted) {
      val want = math.min(maxPerRound, rounds - merges.length)
      // over-fetch 4×: greedy disjointness skips conflicting pairs, and
      // a short fetch would end the round early; skipped pairs are NOT
      // lost — they recount (possibly changed) next round
      val top = vocab
        .select(col("freq"),
          explode(graft.plans.TextExprs.shingles(col("s"), 2, distinct = false))
            .as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
        // a pair seen once merges nothing a tokenizer can reuse
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(if (want == 1) 1 else want * 4).collect()
      if (top.isEmpty) exhausted = true
      else {
        // greedy symbol-disjoint batch in (cnt desc, pair asc) order
        val used = scala.collection.mutable.HashSet[String]()
        val batch = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        top.iterator.takeWhile(_ => batch.length < want).foreach { r =>
          val pair = r.getString(0)
          val sp = pair.indexOf(' ')
          val (a, b) = (pair.substring(0, sp), pair.substring(sp + 1))
          if (!used(a) && !used(b) && !used(a + b)) {
            batch += ((a, b, r.getLong(1)))
            used += a; used += b; used += (a + b)
          }
        }
        merges ++= batch
        val next = vocab.select(col("freq"),
          batch.foldLeft(col("s")) { case (s, (a, b, _)) =>
            applyMerge(s, a, b) }.as("s"))
        vocab = Caches.loopState(next, round + 1, CheckpointEvery)
      }
      round += 1
    }
    spark.createDataFrame(merges.toSeq.zipWithIndex.map {
      case ((a, b, c), r) => (r, a, b, a + b, c)
    }).toDF("rank", "first", "second", "merged", "pair_count")
  }

  /** Rounds between lineage truncations of the vocab loop state — each
    * eager-cached round still APPENDS to the logical plan (analysis cost
    * grows with rounds); [[graft.core.Caches.loopState]]'s periodic
    * localCheckpoint resets it (rationale on the helper). */
  private val CheckpointEvery = 32

  /** Segment a corpus's words with a learned merge list: returns
    * (id, word, pieces) — pieces is the ordered subword array, final
    * piece carrying the [[EndOfWord]] marker. One literal-replace chain
    * per merge — a pure scan, shuffle-free, trivially streamable. */
  def segment(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(id.as("id"), explode(split(text, " ")).as("word"))
    val state = merges.foldLeft(initState(col("word"))) {
      case (s, (a, b)) => applyMerge(s, a, b)
    }
    words.select(col("id"), col("word"), split(state, " ").as("pieces"))
  }
}
