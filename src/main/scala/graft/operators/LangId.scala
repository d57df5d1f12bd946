package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained character-n-gram Naive-Bayes language identification — the
  * production-grade upgrade of [[TextOps.langId]]'s marker-lexicon
  * heuristic (the langdetect/fastText-langid model family, trained on
  * the corpus's own labels).
  *
  * Fit: one corpus-sized aggregation — char n-grams explode → count per
  * (lang, gram) — then everything else operates on the VOCABULARY
  * (char n-gram space is inherently bounded — ~|alphabet|ⁿ — so the
  * dense lang × gram model is corpus-size-independent). Add-k smoothed
  * log-likelihoods: lp(g|l) = ln((c + k) / (tot_l + k·V)); per-language
  * prior ln(n_l / n); unseen-gram default ln(k / (tot_l + k·V)).
  *
  * Predict: per-doc gram counts (one aggregation — shrinks the join to
  * distinct grams per doc), inner-join the dense gram table (per-lang
  * rows), exact-decimal sum of cnt·lp per (doc, lang) — the
  * [[TextOps.bigramLogProbs]] cross-engine determinism recipe: addends
  * quantized to DECIMAL(24,6) so the sum is order-free — plus the
  * out-of-vocabulary mass (ng − seen)·unseen, plus the prior; argmax
  * with ties to the lexicographically smallest language code. Documents
  * shorter than n characters carry no grams and are absent from the
  * output (nothing to classify on).
  *
  * The whole fit+predict run is a pure function of the labeled corpus
  * and replays bit-for-bit in DuckDB (q_langid_trained's oracle).
  */
object LangId {

  /** Overlapping character n-grams via substrings of the raw column —
    * no split, no producer re-evaluation risk (the lambda references
    * only the text attribute and its own variable). */
  def charGrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Fitted model: `grams` = (lang, g, lp) DENSE over vocab × langs;
    * `langs` = (lang, prior, unseen) — broadcast-sized. */
  final case class Model(grams: DataFrame, langs: DataFrame)

  private def dsum(c: Column): Column =
    sum(c.cast("decimal(24,6)")).cast("double")

  def fit(df: DataFrame, text: Column, lang: Column, n: Int = 3,
      k: Double = 0.5): Model = {
    require(n > 0 && k > 0, s"langid: need n > 0, k > 0, got $n/$k")
    // spread: a one-split corpus would run every char-gram explode
    // single-threaded (measured: six 2.5 s one-task stages at sf0.1);
    // eager cnt: tot/vocab/v/grams all consume it, and un-cached each
    // one re-paid the corpus-sized explode+aggregate
    val d = Similarity.spread(df)
    val g = d.select(lang.as("lang"), explode(charGrams(text, n)).as("g"))
    val cnt = graft.core.Caches.eager(
      g.groupBy("lang", "g").agg(count(lit(1)).as("c")))
    val tot = cnt.groupBy("lang").agg(sum(col("c")).as("tl"))
    val vocab = cnt.select("g").distinct()
    val v = vocab.agg(count(lit(1)).as("v"))
    val priors = d.groupBy(lang.as("lang")).agg(count(lit(1)).as("nd"))
    val ndall = d.agg(count(lit(1)).as("ndall"))
    val langs = priors.crossJoin(broadcast(ndall))
      .join(tot, "lang").crossJoin(broadcast(v))
      .select(col("lang"),
        log(col("nd").cast("double") / col("ndall")).as("prior"),
        log(lit(k) / (col("tl") + lit(k) * col("v"))).as("unseen"))
    val grams = vocab.crossJoin(broadcast(tot.crossJoin(broadcast(v))))
      .join(cnt, Seq("lang", "g"), "left")
      .select(col("lang"), col("g"),
        log((coalesce(col("c"), lit(0L)) + lit(k)) /
          (col("tl") + lit(k) * col("v"))).as("lp"))
    Model(grams, langs)
  }

  /** Persist a fitted model — atomically versioned like every model
    * store here ([[graft.core.IndexGen]]): grams + langs + a meta row
    * pinning `n` (the gram width is a property of the FITTED model — a
    * reader probing with a different n would score garbage, so it rides
    * with the artifact, not the call site) land in one generation, one
    * marker rename publishes all three together. */
  def save(model: Model, n: Int, path: String): Unit = {
    val spark = model.grams.sparkSession
    val (dir, gen) = graft.core.IndexGen.stage(path)
    model.grams.select("lang", "g", "lp")
      .write.mode("overwrite").parquet(s"$dir/grams")
    model.langs.select("lang", "prior", "unseen")
      .write.mode("overwrite").parquet(s"$dir/langs")
    spark.range(1).select(lit(n).cast("int").as("n"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    graft.core.IndexGen.commit(path, gen)
  }

  /** Load a [[save]]d model and its gram width `n`. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): (Model, Int) = {
    val dir = graft.core.IndexGen.readDir(path)
    val n = spark.read.parquet(s"$dir/meta").collect()(0).getAs[Int]("n")
    (Model(spark.read.parquet(s"$dir/grams"),
      spark.read.parquet(s"$dir/langs")), n)
  }

  /** (id, lang, score) — the argmax language per document and its
    * log-posterior (rounded via the +1e-9 house nudge downstream if the
    * caller needs cross-engine hashes).
    *
    * Scale shape: the per-gram model pivots to (g, [lp per lang]) and
    * BROADCASTS (vocab × L is bounded — see the object scaladoc), so
    * the corpus is never shuffled by gram; the only corpus-sized
    * exchange is ONE map-side-combinable per-doc aggregation of L
    * decimal sums (L = language count, collected from the model — a
    * bounded driver read). A first formulation joined the dense model
    * by gram instead: docs × grams-per-doc × L rows through two
    * shuffles, 5× slower at sf1. Decimal sums are order-free, so both
    * shapes produce bit-identical scores (same DuckDB oracle). A doc
    * whose grams are ALL out-of-vocabulary still classifies (prior +
    * ng·unseen); sub-n-char docs carry no grams and are absent. */
  def predict(df: DataFrame, id: Column, text: Column, model: Model,
      n: Int = 3): DataFrame = {
    val langCodes = model.langs.select("lang").orderBy("lang")
      .collect().map(_.getString(0)).toSeq
    val perG = model.grams.groupBy("g").agg(
      transform(array_sort(collect_list(struct(col("lang"), col("lp")))),
        e => e.getField("lp")).as("lps"))
    val dg = Similarity.spread(df)
      .select(id.as("id"), explode(charGrams(text, n)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("cnt"))
    val joined = dg.join(broadcast(perG), Seq("g"), "left")
    val sCols = langCodes.indices.map(i =>
      dsum(col("cnt") * element_at(col("lps"), i + 1)).as(s"_s$i"))
    val aggCols = Seq(sum(col("cnt")).as("ng"),
      sum(when(col("lps").isNotNull, col("cnt")).otherwise(lit(0L)))
        .as("seen")) ++ sCols
    val perDoc = joined.groupBy("id").agg(aggCols.head, aggCols.tail: _*)
    val scored = perDoc
      .select(col("id"), col("ng"), col("seen"),
        posexplode(array(langCodes.indices.map(i =>
          struct(lit(langCodes(i)).as("lang"),
            coalesce(col(s"_s$i"), lit(0.0)).as("s"))): _*))
          .as(Seq("_li", "_ls")))
      .select(col("id"), col("ng"), col("seen"),
        col("_ls.lang").as("lang"), col("_ls.s").as("s"))
      .join(broadcast(model.langs), "lang")
      .select(col("id"), col("lang"),
        (col("prior") + col("s") +
          (col("ng") - col("seen")) * col("unseen")).as("score"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("lang").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
