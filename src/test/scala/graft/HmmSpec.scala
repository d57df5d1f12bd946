package graft

import org.apache.spark.sql.functions._
import graft.operators.Hmm

/** Viterbi decoding: the textbook two-state weather model with a
  * hand-computed max-likelihood path. */
class HmmSpec extends SparkSpec {
  import spark.implicits._

  private val model = Hmm.Model(
    states = Seq("R", "S"),
    logInit = Map("R" -> math.log(0.6), "S" -> math.log(0.4)),
    logTrans = Map(
      ("R", "R") -> math.log(0.7), ("R", "S") -> math.log(0.3),
      ("S", "R") -> math.log(0.4), ("S", "S") -> math.log(0.6)),
    logEmit = {
      val e = Map(
        ("R", "walk") -> 0.1, ("R", "shop") -> 0.4, ("R", "clean") -> 0.5,
        ("S", "walk") -> 0.6, ("S", "shop") -> 0.3, ("S", "clean") -> 0.1)
      (s, o) => math.log(e((s, o)))
    })

  test("viterbi decodes the hand-computed path, per instance in parallel") {
    val obs = Seq(
      ("u1", 1L, "walk"), ("u1", 2L, "shop"), ("u1", 3L, "clean"),
      // all-clean run decodes rainy throughout
      ("u2", 1L, "clean"), ("u2", 2L, "clean")).toDF("user", "t", "obs")
    val out = Hmm.viterbi(obs, col("user"), col("t"), col("obs"), model)
    val got = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(3))).toSet
    // walk,shop,clean → S,R,R (argmax .06/.24 → .0384/.0432 → .01344/.0026)
    assert(got == Set(
      ("u1", 1L, "S"), ("u1", 2L, "R"), ("u1", 3L, "R"),
      ("u2", 1L, "R"), ("u2", 2L, "R")))
  }

  test("beam size 1 degrades to greedy decode, still deterministic") {
    val obs = Seq(("u", 1L, "walk"), ("u", 2L, "clean")).toDF("user", "t", "obs")
    val out = Hmm.viterbi(obs, col("user"), col("t"), col("obs"), model,
      beamSize = Some(1))
    val states = out.orderBy("order").collect().map(_.getString(3)).toSeq
    // greedy: t1 keeps only S (.24); t2 from S → R (.4*.5) beats S (.6*.1)
    assert(states == Seq("S", "R"))
  }
}
