package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence harness for the STREAMING twin of the incremental corpus
  * refresh ([[graft.streaming.Streaming.pretrainRefreshStream]]) — the
  * flatness claim measured on the live path: the batch harness
  * ([[PretrainScale]]) pins `pretrainCorpusIncremental` flat across
  * history decades; this one pins the foreachBatch wrapper (MemoryStream
  * feed, at-least-once sink append, `compactEvery` index fold) at the
  * same decades, so the at-least-once + compaction machinery has its own
  * flatness row instead of inheriting the batch twin's by argument.
  *
  * Per history dir: backfill the indexes (one un-timed batch refresh over
  * the whole history — identical to PretrainScale's), then stream the
  * SAME fixed ~2000-doc day's ingest (ids offset out of range; half exact
  * dups of history the exact gate must drop, half reversed-novel) through
  * pretrainRefreshStream as ONE micro-batch with `compactEvery = 1` (the
  * fold runs inside the measured window — the cadence cost is part of the
  * claim, not excluded from it) and report the end-to-end wall +
  * survivors read back from the packed sink.
  *
  * Usage: tools/run.sh graft.PretrainStreamScale <batchSfDir> <histDir…>
  */
object PretrainStreamScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PretrainStreamScale <batchSfDir> <histDir…>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("LC", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SP", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // single lexicon + zero floor, like PretrainScale: GenScale replicas
    // suffix every word, so a multi-lexicon langid would filter the
    // replicas out and flatten the history axis this harness grows
    val markers = Map("en" -> Seq("the"))
    val batchRows = spark.read.parquet(s"${args(0)}/documents.parquet")
      .filter(col("doc_id") < 2000)
      .select((col("doc_id") + lit(10000000000L)).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(reverse(col("text"))).as("text"))
      .as[(Long, String)].collect()
    val heldout = spark.read.parquet(s"${args(0)}/documents.parquet")
      .filter(col("doc_id") % 97 === 0).select("text")
    println(s"batch=${batchRows.length} docs (fixed) from ${args(0)}")
    args.drop(1).foreach { hist =>
      val docs = spark.read.parquet(s"$hist/documents.parquet")
        .select("doc_id", "text")
      val n = docs.count()
      val root = java.nio.file.Files
        .createTempDirectory("pretrain_stream_scale_").toString
      // backfill (un-timed): create the indexes over the whole history —
      // the one-time cost PretrainScale already reports
      graft.operators.Pipelines.pretrainCorpusIncremental(
        docs, col("doc_id"), col("text"), markers, keepLang = "en",
        stopwords = Seq("the", "a"), minQuality = 0.0, blocklist = Nil,
        hashIndex = s"$root/hash", sigIndex = s"$root/sig",
        heldout = heldout, heldoutText = col("text"), ngram = 5,
        sampleRate = 0.6, salt = "ps", packBudget = 256,
        packBuckets = 4).count()
      spark.catalog.clearCache(); graft.core.Caches.drain()
      // the day's ingest, streamed: one micro-batch through the twin
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val t0 = System.nanoTime()
      val sq = graft.streaming.Streaming.pretrainRefreshStream(
        in.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"),
        markers, keepLang = "en", stopwords = Seq("the", "a"),
        minQuality = 0.0, blocklist = Nil,
        hashIndex = s"$root/hash", sigIndex = s"$root/sig",
        heldout = heldout, heldoutText = col("text"), ngram = 5,
        sampleRate = 0.6, salt = "ps", packBudget = 256, packBuckets = 4,
        packedOut = s"$root/packed", checkpoint = s"$root/ckpt",
        compactEvery = 1).start()
      try {
        in.addData(batchRows.toIndexedSeq)
        sq.processAllAvailable()
      } finally sq.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val kept = spark.read.parquet(s"$root/packed").count()
      spark.catalog.clearCache(); graft.core.Caches.drain()
      println(f"hist=$hist%-12s docs=$n%8d streamed_refresh=$wall%6.1f s " +
        f"(kept=$kept%d, compactEvery=1)")
    }
    spark.stop()
  }
}
