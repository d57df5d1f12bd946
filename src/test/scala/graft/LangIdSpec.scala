package graft

import org.apache.spark.sql.functions._
import graft.operators.LangId

/** Trained char-n-gram Naive-Bayes language ID (operators/LangId.scala). */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "aaaa bbbb aaaa", "aa"),
    (2L, "aaab bbba aaab", "aa"),
    (3L, "zzzz yyyy zzzz", "zz"),
    (4L, "zzzy yyyz zzzy", "zz")).toDF("doc_id", "text", "lang")

  test("fit/predict recovers the training labels on separable corpora") {
    val m = LangId.fit(corpus, col("text"), col("lang"))
    val out = LangId.predict(corpus, col("doc_id"), col("text"), m)
      .select("id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "aa", 2L -> "aa", 3L -> "zz", 4L -> "zz"))
  }

  test("unseen grams fall back to the smoothed default, prior breaks " +
      "all-unseen docs; sub-n docs are absent") {
    val train = Seq(
      (1L, "aaaa aaaa", "aa"), (2L, "aaab aaab", "aa"),
      (3L, "zzzz zzzz", "zz")).toDF("doc_id", "text", "lang")
    val m = LangId.fit(train, col("text"), col("lang"))
    val test2 = Seq((10L, "qqqq qqqq"), (11L, "zz")).toDF("doc_id", "text")
    val out = LangId.predict(test2, col("doc_id"), col("text"), m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // doc 10: every gram OOV → score = prior + ng·unseen per lang; "aa"
    // has the larger prior (2/3 docs) AND the larger smoothed-total
    // denominator penalty — winner must still be deterministic
    assert(out.contains(10L))
    // doc 11 is shorter than n=3 chars → no grams → absent
    assert(!out.contains(11L))
  }

  test("tie-break on equal scores goes to the smallest lang code") {
    // perfectly symmetric corpus: every doc scores identically under
    // both languages' models after relabeling — ties must go to "aa"
    val train = Seq(
      (1L, "abab", "aa"), (2L, "abab", "zz")).toDF("doc_id", "text", "lang")
    val m = LangId.fit(train, col("text"), col("lang"))
    val out = LangId.predict(Seq((9L, "abab")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), m)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((9L, "aa")))
  }

  test("deterministic replay: identical scores across re-runs") {
    val m1 = LangId.fit(corpus, col("text"), col("lang"))
    val m2 = LangId.fit(corpus, col("text"), col("lang"))
    val a = LangId.predict(corpus, col("doc_id"), col("text"), m1)
      .orderBy("id").collect().toSeq
    val b = LangId.predict(corpus, col("doc_id"), col("text"), m2)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("save/load round-trips the model and its gram width: loaded " +
      "predictions are bit-identical; re-save publishes a new generation") {
    val path = java.nio.file.Files.createTempDirectory("langid_model")
      .toString + "/m"
    val m = LangId.fit(corpus, col("text"), col("lang"))
    LangId.save(m, 3, path)
    val (loaded, n) = LangId.load(spark, path)
    assert(n == 3)
    val direct = LangId.predict(corpus, col("doc_id"), col("text"), m)
      .orderBy("id").collect().toSeq
    val fromDisk = LangId.predict(corpus, col("doc_id"), col("text"),
      loaded, n).orderBy("id").collect().toSeq
    assert(direct == fromDisk)
    // re-save (e.g. a re-fit on fresh labels) lands atomically as a new
    // generation — readers see old or new, never a mix
    LangId.save(m, 3, path)
    val (again, n2) = LangId.load(spark, path)
    assert(n2 == 3 && again.grams.count() == loaded.grams.count())
  }

  test("plan shape: lang metadata broadcasts; corpus never broadcast") {
    val m = LangId.fit(corpus, col("text"), col("lang"))
    val plan = LangId.predict(corpus, col("doc_id"), col("text"), m)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
