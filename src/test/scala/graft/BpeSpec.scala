package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge learning / segmentation semantics (operators/Bpe.scala). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-computed rounds, lexicographic tie-break, " +
      "early stop when no pair repeats") {
    // freqs: ab:2, ac:1 → states "a b </w>"×2, "a c </w>"
    // round 1 pairs: (a,b):2, (b,</w>):2, (a,c):1, (c,</w>):1
    //   tie at 2 → lexicographic: "a b" < "b </w>" → merge (a,b)
    // round 2 pairs: (ab,</w>):2, rest cnt 1 → merge (ab,</w>)
    // round 3: every pair cnt 1 → filtered → early stop (2 rows, not 4)
    val docs = Seq((1L, "ab ab ac")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, col("text"), rounds = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(m.toSeq == Seq(
      (0, "a", "b", "ab", 2L),
      (1, "ab", "</w>", "ab</w>", 2L)))
  }

  test("merge application is greedy left-to-right non-overlapping") {
    // "aaa" merging (a,a) must give [aa, a], never [a, aa]
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // round 1: (a,a) cnt 4 beats (a,</w>) cnt 2
    val m = Bpe.learnMerges(docs, col("text"), rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(m == Seq(("a", "a")))
    val seg = Bpe.segment(docs.limit(1), col("doc_id"), col("text"), m)
      .select("pieces").collect().head.getSeq[String](0)
    assert(seg == Seq("aa", "a", "</w>"))
  }

  test("segment round-trips: pieces concatenate back to word + marker") {
    val docs = Seq((1L, "lower lowest low low lower")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, col("text"), rounds = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Bpe.segment(docs, col("doc_id"), col("text"), merges)
      .select("word", "pieces").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getSeq[String](1)
      assert(pieces.mkString("") == word + Bpe.EndOfWord,
        s"$word -> $pieces")
      assert(pieces.last.endsWith(Bpe.EndOfWord))
    }
  }

  test("determinism: re-learning yields the identical merge table") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs, col("text"), rounds = 5)
      .orderBy("rank").collect().toSeq
    val b = Bpe.learnMerges(docs, col("text"), rounds = 5)
      .orderBy("rank").collect().toSeq
    assert(a == b && a.size == 5)
  }

  test("batched learning: rounds ≪ merges, symbol-disjoint batches, " +
      "exact at maxPerRound = 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta omega theta"),
      (3L, "alpha beta sigma kappa lambda mu"),
      (4L, "nu xi omicron pi rho tau")).toDF("doc_id", "text")
    // count Spark jobs: the sequential trainer pays O(merges) driver
    // round-trips, the batched one O(merges / maxPerRound)
    def jobsDuring(f: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { n.incrementAndGet(); () }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        f
        // drain the async listener bus: poll until the count is stable
        // (a fixed sleep is flaky under this host's CPU-steal windows)
        var prev = -1; var stable = 0; var waited = 0
        while (stable < 3 && waited < 10000) {
          Thread.sleep(100); waited += 100
          if (n.get == prev) stable += 1 else { stable = 0; prev = n.get }
        }
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    var seq12: Seq[Any] = null
    var bat12: Seq[Any] = null
    val seqJobs = jobsDuring {
      seq12 = Bpe.learnMerges(docs, col("text"), rounds = 12)
        .orderBy("rank").collect().toSeq
    }
    val batJobs = jobsDuring {
      bat12 = Bpe.learnMerges(docs, col("text"), rounds = 12, maxPerRound = 8)
        .orderBy("rank").collect().toSeq
    }
    assert(seq12.size == 12 && bat12.size == 12)
    assert(batJobs * 2 <= seqJobs,
      s"batched trainer must cut driver round-trips: $batJobs vs $seqJobs")
    // the trainers agree on the head of the run (batching can only defer
    // preferences created BY a batch, so merge 0 — computed from the
    // same initial counts — is identical), and the batched run is fully
    // deterministic (replay-equal)
    assert(bat12.head == seq12.head)
    val bat12b = Bpe.learnMerges(docs, col("text"), rounds = 12,
      maxPerRound = 8).orderBy("rank").collect().toSeq
    assert(bat12b == bat12)
    // each round's kept batch is symbol-disjoint by construction: no
    // first/second symbol of a merge equals another merge's first,
    // second, or merged form within the SAME collect — verified
    // indirectly: applying the batched merges via segment round-trips
    val out = Bpe.segment(docs, col("doc_id"), col("text"),
        bat12.map { case r: org.apache.spark.sql.Row =>
          (r.getString(1), r.getString(2)) })
      .select("word", "pieces").collect()
    out.foreach { r =>
      assert(r.getSeq[String](1).mkString("") ==
        r.getString(0) + Bpe.EndOfWord)
    }
  }

  test("segment plan is shuffle-free (literal replace chain, one scan)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Bpe.segment(docs, col("doc_id"), col("text"),
        Seq(("a", "b"), ("ab", "</w>")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
