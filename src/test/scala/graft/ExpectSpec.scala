package graft

import org.apache.spark.sql.functions._
import graft.core.Expect

/** Data-quality expectations: NULL-violates semantics, one-pass report,
  * quarantine split, eager enforce. */
class ExpectSpec extends SparkSpec {
  import spark.implicits._

  private def d = Seq(
    (1L, java.lang.Double.valueOf(5.0)),
    (2L, java.lang.Double.valueOf(-1.0)),
    (3L, null.asInstanceOf[java.lang.Double])).toDF("id", "v")

  private val rules = Seq(
    "v_positive" -> (col("v") > 0),
    "id_known" -> col("id").isin(1L, 2L, 3L))

  test("check reports per-rule violations; NULL predicate violates") {
    val r = Expect.check(d, rules).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("v_positive") == ((2L, 3L))) // -1 fails, NULL counts as fail
    assert(r("id_known") == ((0L, 3L)))
    intercept[IllegalArgumentException] { Expect.check(d, Nil) }
  }

  test("split quarantines violating rows with the broken-rule names") {
    val (ok, bad) = Expect.split(d, rules)
    assert(rowsOf(ok.select("id")) == Set(Seq(1L)))
    val names = bad.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](2).toSet).toMap
    assert(names == Map(2L -> Set("v_positive"), 3L -> Set("v_positive")))
    assert(ok.columns.toSeq == d.columns.toSeq) // marker column dropped
  }

  test("enforce raises with the failing rules, passes a clean table") {
    val e = intercept[IllegalStateException] { Expect.enforce(d, rules) }
    assert(e.getMessage.contains("v_positive") && e.getMessage.contains("2/3"))
    assert(!e.getMessage.contains("id_known"))
    val clean = d.filter(col("v") > 0)
    assert(Expect.enforce(clean, rules).count() == 1)
  }
}
