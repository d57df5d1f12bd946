package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Caches

/** Trainable text classification for training-data pipelines — the
  * fastText-style linear classifier labs run as a pretraining quality /
  * language filter (reference analog: the classifier family of
  * stdlib/ml/classifiers; the hashed-bag-of-words + linear-model recipe
  * is the published fastText/CCNet quality-filter shape).
  *
  * Deterministic twin of full-batch logistic regression, built on the
  * same exact-arithmetic playbook as [[Clustering.kmeans]] so a DuckDB
  * oracle replays training bit-for-bit:
  *
  *  - features: signed md5 hashing-trick bag of words
  *    ([[graft.plans.VecExprs.hashEmbed]] — one native O(tokens+dim)
  *    pass), integer counts, plus a constant bias feature;
  *  - weights are 2⁻³⁰-quantized BIGINTs, so the margin
  *    zq = Σ wq_d·x_d is EXACT integer arithmetic — order-free, no
  *    float-summation ambiguity;
  *  - the link is the HARD sigmoid σ(z) = clamp(0.5 + z/4, 0, 1) —
  *    piecewise linear, so every engine computes the identical double
  *    (libm exp() is not cross-engine reproducible; the hard sigmoid is
  *    the standard low-precision surrogate and keeps gradients exact);
  *  - per-row errors re-quantize to BIGINT before the gradient sum, so
  *    gradients are exact order-free integers; the weight step rounds
  *    once per round (identical IEEE ops on identical values on every
  *    engine — deterministic even where no longer exact).
  *
  * Scale shape (the 100 TB fit): each round is ONE broadcast of the
  * (dim+1)-row weight table + an in-row O(dim) integer fold for the
  * margin + one map-side-combinable aggregate by feature index for the
  * gradient — shuffled volume per round is nnz(features) rows collapsing
  * to dim+1, independent of corpus size in the combine. Features are
  * computed once and cached; `rounds` is a fixed constant. Prediction
  * is a single broadcast + scan — the shape of every model-based corpus
  * filter.
  */
object Classify {

  private val Scale = 1L << 30

  /** (id, y, xa) rows: xa = [1 (bias), b_1, …, b_dim] signed hashed
    * token counts as exact BIGINTs. */
  private def featurize(df: DataFrame, id: Column, text: Column,
      label: Column, dim: Int): DataFrame =
    graft.core.Par.spread(df)
      .select(id.as("id"), label.cast("int").as("y"),
        graft.plans.VecExprs.hashEmbed(text, dim).as("_e"))
      .select(col("id"), col("y"),
        concat(array(lit(1L)),
          transform(slice(col("_e"), 2, dim), x => x.cast("long"))).as("xa"))

  /** One-row frame holding the weight vector as an array (index i =
    * weight of feature d = i−1), for broadcast into the margin fold. */
  private def weightArray(w: DataFrame): DataFrame =
    w.agg(transform(array_sort(collect_list(struct(col("d"), col("wq")))),
      e => e.getField("wq")).as("_wa"))

  /** Margin + hard-sigmoid score + quantized error for every feature row
    * against the broadcast weight array. */
  private def score(feats: DataFrame, w: DataFrame, dim: Int): DataFrame =
    feats.crossJoin(broadcast(weightArray(w)))
      // zip_with references xa/_wa ONCE each, then folds the product
      // array — same ascending-index left-associative exact-long sum as
      // the element_at fold it replaces. The fold-with-element_at form
      // re-evaluated the REFERENCED projections per element (Catalyst
      // inlines producers into lambda references — the WinnowExpr
      // lesson), costing dim+1 hash_embed evaluations per row on the
      // un-cached predict path.
      .withColumn("zq", aggregate(
        zip_with(col("_wa"), col("xa"), (wq, x) => wq * x),
        lit(0L), (acc, p) => acc + p))
      .withColumn("s", least(greatest(
        lit(0.5) + col("zq").cast("double") / lit(Scale.toDouble) / lit(4.0),
        lit(0.0)), lit(1.0)))

  /** Fit `rounds` full-batch gradient steps from zero weights. `label`
    * must be 0/1. Returns the MODEL: (d, wq, w) with d = 0 the bias and
    * d = 1..dim the hash buckets — dim+1 rows, broadcast-sized, the
    * fit-once half of the fit/predict split (train on a labeled sample,
    * score any corpus). */
  def logregFit(df: DataFrame, id: Column, text: Column, label: Column,
      dim: Int, rounds: Int, lr: Double = 0.5): DataFrame = {
    require(dim > 0 && rounds >= 0 && lr > 0,
      s"logreg: need dim > 0, rounds >= 0, lr > 0, got $dim/$rounds/$lr")
    val spark = df.sparkSession
    val feats = Caches.eager(featurize(df, id, text, label, dim))
    val n = feats.count().toDouble
    var w: DataFrame = Caches.eager(spark.range(dim + 1)
      .select(col("id").cast("int").as("d"), lit(0L).as("wq")))
    for (_ <- 0 until rounds) {
      val eq = score(feats, w, dim)
        .withColumn("eq",
          floor((col("s") - col("y")) * lit(Scale.toDouble) + lit(0.5))
            .cast("long"))
      // sparse gradient: zero feature values contribute nothing, so they
      // never enter the shuffle; the by-d aggregate map-side combines
      val grad = eq.select(col("eq"), posexplode(col("xa")).as(Seq("i", "x")))
        .filter(col("x") =!= 0)
        .groupBy(col("i").cast("int").as("d"))
        .agg(sum(col("eq") * col("x")).as("gq"))
      w = Caches.eager(w.join(grad, Seq("d"), "left")
        .select(col("d"),
          (col("wq") - floor(coalesce(col("gq"), lit(0L)).cast("double")
            * lit(lr) / lit(n) + lit(0.5)).cast("long")).as("wq")))
    }
    w.withColumn("w", col("wq").cast("double") / lit(Scale.toDouble))
  }

  /** Score a corpus against a fitted model: (id, score) with score =
    * σ_hard(w·x) ∈ [0, 1] — filter with `score >= tau`. One broadcast +
    * one scan, no shuffle. */
  def logregPredict(df: DataFrame, id: Column, text: Column,
      model: DataFrame, dim: Int): DataFrame =
    score(featurize(df, id, text, lit(0), dim), model, dim)
      .select(col("id"), col("s").as("score"))

  /** Persist a fitted model (dim+1 rows) — atomically versioned like
    * every model/index save ([[graft.core.IndexGen]]): a re-fit
    * publishes with one marker rename, concurrent readers see a
    * complete model, old or new. */
  def logregSave(model: DataFrame, path: String): Unit = {
    val (dir, gen) = graft.core.IndexGen.stage(path)
    model.select("d", "wq").write.mode("overwrite").parquet(s"$dir/weights")
    graft.core.IndexGen.commit(path, gen)
  }

  /** Load a [[logregSave]]d model and its feature dimension (derived
    * from the weight-row count — the artifact IS dim+1 rows, so the
    * geometry travels with it; the read is one bounded model-sized
    * count, the same contract as every meta read here). */
  def logregLoad(spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, Int) = {
    val dir = graft.core.IndexGen.readDir(path)
    val w = spark.read.parquet(s"$dir/weights")
    (w, w.count().toInt - 1)
  }

  /** Score a corpus against a [[logregSave]]d model without re-fitting. */
  def logregLoadPredict(spark: org.apache.spark.sql.SparkSession,
      path: String, df: DataFrame, id: Column, text: Column,
      dim: Int): DataFrame = {
    val dir = graft.core.IndexGen.readDir(path)
    logregPredict(df, id, text, spark.read.parquet(s"$dir/weights"), dim)
  }
}
