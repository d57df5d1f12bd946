package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence harness for [[graft.operators.Pipelines
  * .pretrainCorpusIncremental]]'s reason to exist: a DAY-OVER-DAY
  * corpus refresh must not re-pay full-corpus dedup. Measures, per
  * history dir:
  *
  *  - `backfill`: the one-time first refresh over the whole history
  *    (builds the hash + signature indexes — in-batch work, same order
  *    as a full build);
  *  - `refresh`: a FIXED ~2000-doc "day's ingest" (half exact dups of
  *    history, half novel texts, ids disjoint by offset) through the
  *    incremental chain against the persisted indexes;
  *  - `rebuild`: [[graft.operators.Pipelines.pretrainCorpusFull]] over
  *    history ∪ batch — what refreshing WITHOUT the indexes costs.
  *
  * The claim under test: `refresh` is flat in history size while
  * `rebuild` grows with it (the from-scratch chain re-shingles and
  * re-canonicalizes ALL history per run).
  *
  * Usage: tools/run.sh graft.PretrainScale <batchSfDir> <histDir…> */
object PretrainScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PretrainScale <batchSfDir> <histDir…>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("LC", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SP", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // single lexicon + zero floor: every doc passes the predicate
    // stages, so the HISTORY-SIZE axis lands on the dedup machinery —
    // GenScale replicas suffix every word (disjoint shingles), which a
    // multi-lexicon langid would silently filter out, flattening
    // exactly the variable this harness exists to grow
    val markers = Map("en" -> Seq("the"))
    // FIXED day's ingest: the same ~2000 docs whatever the history —
    // ids offset out of every history's range; half keep their text
    // (re-crawled content the exact gate must drop against history),
    // half reversed (novel shingle space that survives both gates)
    val batch = spark.read.parquet(s"${args(0)}/documents.parquet")
      .filter(col("doc_id") < 2000)
      .select((col("doc_id") + lit(10000000000L)).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(reverse(col("text"))).as("text"))
    val heldout = spark.read.parquet(s"${args(0)}/documents.parquet")
      .filter(col("doc_id") % 97 === 0).select("text")
    println(s"batch=${batch.count()} docs (fixed) from ${args(0)}")
    def timeIt(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    args.drop(1).foreach { hist =>
      val docs = spark.read.parquet(s"$hist/documents.parquet")
        .select("doc_id", "text")
      val n = docs.count()
      val root = java.nio.file.Files
        .createTempDirectory(s"pretrain_scale_").toString
      def refresh(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Pipelines.pretrainCorpusIncremental(
          df, col("doc_id"), col("text"), markers, keepLang = "en",
          stopwords = Seq("the", "a"), minQuality = 0.0, blocklist = Nil,
          hashIndex = s"$root/hash", sigIndex = s"$root/sig",
          heldout = heldout, heldoutText = col("text"), ngram = 5,
          sampleRate = 0.6, salt = "ps", packBudget = 256,
          packBuckets = 4).count()
      val (backfillS, _) = timeIt(refresh(docs))
      spark.catalog.clearCache(); graft.core.Caches.drain()
      val (refreshS, kept) = timeIt(refresh(batch))
      spark.catalog.clearCache(); graft.core.Caches.drain()
      val (rebuildS, rebuilt) = timeIt(
        graft.operators.Pipelines.pretrainCorpusFull(
          docs.unionByName(batch), col("doc_id"), col("text"), markers,
          keepLang = "en", stopwords = Seq("the", "a"), minQuality = 0.0,
          blocklist = Nil, boilerplate = None,
          nearDup = Some(graft.operators.Pipelines.NearDupConfig()),
          heldout = heldout, heldoutText = col("text"), ngram = 5,
          sampleRate = 0.6, salt = "ps", packBudget = 256,
          packBuckets = 4).count())
      spark.catalog.clearCache(); graft.core.Caches.drain()
      println(f"hist=$hist%-12s docs=$n%8d backfill=$backfillS%7.1f s   " +
        f"refresh=$refreshS%6.1f s (kept=$kept%d)   " +
        f"rebuild=$rebuildS%7.1f s (kept=$rebuilt%d)")
    }
    spark.stop()
  }
}
