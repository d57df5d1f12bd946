package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Hashed-feature hard-sigmoid logistic regression semantics. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // separable toy corpus: the positive class is saturated with a marker
  // token, the negative class never contains it
  private def corpus = (1 to 40).map { i =>
    if (i % 2 == 0)
      (i.toLong, s"buy spamword now great offer n$i spamword spamword", 1)
    else
      (i.toLong, s"quiet prose about engines and rivers n$i flowing", 0)
  }.toDF("id", "text", "y")

  test("logregFit separates a separable corpus") {
    val m = Classify.logregFit(corpus, col("id"), col("text"), col("y"),
      dim = 16, rounds = 4, lr = 0.1)
    val scored = Classify.logregPredict(corpus, col("id"), col("text"), m, 16)
      .join(corpus.select(col("id"), col("y")), "id")
      .select(col("y"), col("score")).collect()
    val pos = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val neg = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
    // every positive outranks every negative — full separation
    assert(pos.min > neg.max)
    assert(pos.min > 0.5 && neg.max < 0.5)
  }

  test("rounds = 0 is the zero model: every score is exactly 0.5") {
    val m = Classify.logregFit(corpus, col("id"), col("text"), col("y"),
      dim = 16, rounds = 0)
    val scores = Classify.logregPredict(corpus, col("id"), col("text"), m, 16)
      .select("score").collect().map(_.getDouble(0)).toSet
    assert(scores == Set(0.5))
  }

  test("training is deterministic: re-fit reproduces identical weights") {
    def fit() = Classify.logregFit(corpus, col("id"), col("text"), col("y"),
      dim = 16, rounds = 3, lr = 0.2).select("d", "wq")
    assert(rowsOf(fit()) == rowsOf(fit()))
  }

  test("save/load round-trips: loaded model scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("logreg").toString
    val m = Classify.logregFit(corpus, col("id"), col("text"), col("y"),
      dim = 16, rounds = 3, lr = 0.2)
    Classify.logregSave(m, dir)
    val direct = Classify.logregPredict(corpus, col("id"), col("text"), m, 16)
    val loaded = Classify.logregLoadPredict(spark, dir, corpus,
      col("id"), col("text"), 16)
    assert(rowsOf(direct) == rowsOf(loaded))
    // logregLoad derives the dimension from the artifact itself (dim+1
    // weight rows) — the geometry travels with the model
    val (w, dim) = Classify.logregLoad(spark, dir)
    assert(dim == 16)
    assert(rowsOf(Classify.logregPredict(corpus, col("id"), col("text"),
      w, dim)) == rowsOf(direct))
  }

  test("invalid hyperparameters raise") {
    intercept[IllegalArgumentException] {
      Classify.logregFit(corpus, col("id"), col("text"), col("y"),
        dim = 0, rounds = 1)
    }
    intercept[IllegalArgumentException] {
      Classify.logregFit(corpus, col("id"), col("text"), col("y"),
        dim = 16, rounds = 1, lr = 0.0)
    }
  }
}
