package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Differential test: the distributed asof join (union + window pass)
  * must agree with a brute-force in-memory reference on randomized
  * inputs — multiple keys, shared timestamps between sides, empty
  * sides, both directions. Complements the doctest goldens (fixed
  * examples) with generated boundary coverage. Seeded generator: a
  * failure reproduces exactly. */
class AsofPropertySpec extends SparkSpec {
  import spark.implicits._

  private def genRows(rnd: scala.util.Random, n: Int): List[(String, Long, Long)] =
    List.fill(n)((Seq("a", "b", "c")(rnd.nextInt(3)),
      rnd.nextInt(21).toLong, rnd.nextInt(100).toLong))

  /** Brute-force reference: per left row, the right value at the
    * largest rt <= lt (backward) / smallest rt >= lt (forward). Right
    * (k, rt) are unique by construction, so no tie-break is needed. */
  private def expected(left: List[(String, Long, Long)],
      right: List[(String, Long, Long)],
      dir: Temporal.Direction): Set[(String, Long, Long, Option[Long])] =
    left.map { case (k, lt, lv) =>
      val cands = right.filter(_._1 == k)
      val pick = dir match {
        case Temporal.Backward =>
          val c = cands.filter(_._2 <= lt)
          if (c.isEmpty) None else Some(c.maxBy(_._2)._3)
        case Temporal.Forward =>
          val c = cands.filter(_._2 >= lt)
          if (c.isEmpty) None else Some(c.minBy(_._2)._3)
        case Temporal.Nearest =>
          // min |rt - lt|; equidistant tie → backward (earlier) wins,
          // matching the operator's documented rule
          val back = cands.filter(_._2 <= lt).sortBy(_._2).lastOption
          val fwd = cands.filter(_._2 >= lt).sortBy(_._2).headOption
          (back, fwd) match {
            case (None, f) => f.map(_._3)
            case (b, None) => b.map(_._3)
            case (Some(b), Some(f)) =>
              if (lt - b._2 <= f._2 - lt) Some(b._3) else Some(f._3)
          }
      }
      (k, lt, lv, pick)
    }.toSet

  private def run(left: List[(String, Long, Long)],
      right: List[(String, Long, Long)],
      dir: Temporal.Direction): Set[(String, Long, Long, Option[Long])] = {
    val l = left.toDF("k", "lt0", "lv")
      .select(col("k"), timestamp_seconds(col("lt0")).as("lt"), col("lv"))
    val r = right.toDF("k", "rt0", "rv")
      .select(col("k"), timestamp_seconds(col("rt0")).as("rt"), col("rv"))
    Temporal.asofJoin(l, r, col("lt"), col("rt"), Seq("k"), dir, "left")
      .select(col("k"), unix_seconds(col("lt")).as("lt"), col("lv"), col("rv"))
      .collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .toSet
  }

  test("asof join agrees with brute force on random inputs (backward + forward)") {
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 12) {
      // unique left triples (the operator emits one row per left ROW and
      // exact duplicates collapse in the Set compare); unique right
      // (k, rt) so no tie-break enters the expected model
      val l = genRows(rnd, rnd.nextInt(26)).distinct
      val r = genRows(rnd, rnd.nextInt(26))
        .groupBy(x => (x._1, x._2)).map(_._2.head).toList
      for (dir <- Seq(Temporal.Backward, Temporal.Forward, Temporal.Nearest)) {
        val got = run(l, r, dir)
        val want = expected(l, r, dir)
        assert(got == want,
          s"round $round dir $dir\nleft=$l\nright=$r\ngot=$got\nwant=$want")
      }
    }
  }

  test("interval join agrees with brute force on random inputs and bounds") {
    val rnd = new scala.util.Random(77L)
    for (round <- 1 to 10) {
      val l = genRows(rnd, rnd.nextInt(21)).distinct
      val r = genRows(rnd, rnd.nextInt(21)).distinct
      val lb = rnd.nextInt(11) - 5 // [-5, 5]
      val ub = lb + rnd.nextInt(8) // lb <= ub <= lb+7, inclusive bounds
      val lDf = l.toDF("k", "lt0", "lv")
        .select(col("k"), timestamp_seconds(col("lt0")).as("lt"), col("lv"))
      val rDf = r.toDF("k", "rt0", "rv")
        .select(col("k"), timestamp_seconds(col("rt0")).as("rt"), col("rv"))
      val got = Temporal.intervalJoin(lDf, rDf, col("lt"), col("rt"),
          lb.toDouble, ub.toDouble, keys = Seq("k"))
        .select(col("k"), col("lv"), col("rv")).collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toList.sorted
      val want = (for {
        (k, lt, lv) <- l; (rk, rt, rv) <- r
        if rk == k && rt - lt >= lb && rt - lt <= ub
      } yield (k, lv, rv)).sorted
      assert(got == want, s"round $round bounds [$lb,$ub]\nleft=$l\nright=$r")
    }
  }
}
