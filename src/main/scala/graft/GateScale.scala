package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence harness for the VALUE of the DocStore ingest dedup gates:
  * the gates' pitch is "at 100 TB the embedder is the expensive stage,
  * so duplicates must never reach it" — this measures, for the
  * q_doc_store_dedup two-ingest scenario (ingest 1 = even doc ids,
  * ingest 2 = the whole corpus, i.e. a full re-ingest plus the odds),
  * how many rows actually REACH the embedder with the gate on vs off,
  * plus what the gate costs in wall time at the stub-embedder floor
  * (a real model embedder multiplies the saved rows by its per-row
  * cost; the gate overhead stays what is measured here).
  *
  * Usage: tools/run.sh graft.GateScale <sfDir> (env LC/SP as usual).
  * Embedder invocations are counted by a LongAccumulator inside the
  * `Column => Column` stub (an identity UDF feeding the real
  * hashEmbed kernel — both arms pay the same per-row cost, so the
  * wall comparison isolates the gate). */
object GateScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: GateScale <sfDir>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("LC", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SP", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
    println(s"corpus=${raw.count()} docs from ${args(0)}")

    def scenario(label: String, gated: Boolean): Unit = {
      val acc = spark.sparkContext.longAccumulator(s"embed_$label")
      val countId = udf { t: String => acc.add(1); t }
      val counting: Column => Column =
        c => graft.plans.VecExprs.hashEmbed(countId(c), 16)
      val idx =
        if (gated) Some(java.nio.file.Files
          .createTempDirectory("gate_scale_idx").toString + "/idx")
        else None
      val t0 = System.nanoTime()
      val st1 = graft.operators.DocStore.build(
        raw.filter(col("doc_id") % 2 === 0),
        col("doc_id"), col("data"), chunkSize = 8, overlap = 3,
        embedder = counting, dedupIndex = idx)
      val t1 = System.nanoTime()
      val rows1 = acc.value
      val st2 = graft.operators.DocStore.build(raw, col("doc_id"),
        col("data"),
        chunkSize = 8, overlap = 3, embedder = counting, dedupIndex = idx)
      val t2 = System.nanoTime()
      // the accumulator tallies UDF EVALUATIONS, not logical embedder
      // invocations — task retries, speculation, or a plan branch
      // re-evaluating the embed column would inflate it. Cross-check
      // against the materialized surviving-chunk counts (cache hits —
      // no re-embeds): equal means the one-eval assumption held and the
      // headline numbers really are per-surviving-chunk invocations.
      val (chunks1, chunks2) = (st1.chunks.count(), st2.chunks.count())
      val delta = acc.value - chunks1 - chunks2
      spark.catalog.clearCache(); graft.core.Caches.drain()
      println(f"$label%-9s ingest1=${(t1 - t0) / 1e9}%6.1f s " +
        f"embeds1=$rows1%9d   ingest2=${(t2 - t1) / 1e9}%6.1f s " +
        f"embeds2=${acc.value - rows1}%9d   total_embeds=${acc.value}%d")
      println(f"$label%-9s surviving_chunks=${chunks1 + chunks2}%9d " +
        f"eval_minus_chunks=$delta%d" +
        (if (delta != 0) "  ** MISMATCH: retries/re-evaluation inflated the count **"
         else "  (one eval per surviving chunk — counts are exact)"))
    }
    scenario("gates_off", gated = false)
    scenario("gates_on", gated = true)
    spark.stop()
  }
}
