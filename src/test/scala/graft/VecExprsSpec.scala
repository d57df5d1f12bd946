package graft

import org.apache.spark.sql.functions._
import graft.plans.VecExprs

/** Native vector expressions: dot product and matmul semantics. */
class VecExprsSpec extends SparkSpec {
  import spark.implicits._

  test("dotProduct: in-order sum, null array propagates, float input casts") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(1.0, 1.0), Seq(2.0, 2.0))).toDF("id", "a", "b")
    val out = df.select(col("id"), VecExprs.dotProduct(col("a"), col("b")).as("d"))
    assert(rowsOf(out) == Set(Seq(1L, 32.0), Seq(2L, 4.0)))
    val withNull = df.select(VecExprs.dotProduct(
      when(col("id") === 1, col("a")), col("b")).as("d"))
    assert(rowsOf(withNull) == Set(Seq(32.0), Seq(null)))
    // float arrays implicit-cast to double
    val f = Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0))).toDF("a", "b")
    assert(f.select(VecExprs.dotProduct(col("a"), col("b"))).head.getDouble(0) == 11.0)
  }

  test("dotProduct: length mismatch → NULL (codegen and interpreted)") {
    // codegen path (plain projection over a DataFrame)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    assert(df.select(VecExprs.dotProduct(col("a"), col("b"))).head.isNullAt(0))
    // interpreted path: eval() the catalyst expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def lit3(xs: Double*) = Literal.create(xs.toArray, ArrayType(DoubleType))
    assert(graft.plans.DotProductExpr(lit3(1.0, 2.0, 3.0), lit3(4.0, 5.0))
      .eval(null) == null)
    assert(graft.plans.DotProductExpr(lit3(1.0, 2.0), lit3(3.0, 4.0))
      .eval(null) == 11.0)
  }

  test("signPack: bit layout, tail word, zero/negative → 0-bit, null") {
    // 3 dims in word 0: bits 0 (1.5 > 0), not 1 (-2), not 2 (0) → 1L
    val df = Seq(
      (1L, Seq(1.5, -2.0, 0.0)),
      (2L, Seq.tabulate(70)(i => if (i == 0 || i == 64) 1.0 else -1.0)))
      .toDF("id", "v")
    val out = df.select(col("id"), VecExprs.signPack(col("v")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(1L))
    // 70 dims → 2 words; bit 0 of each word set
    assert(out(2L) == Seq(1L, 1L))
    // null vector propagates
    assert(df.select(VecExprs.signPack(when(col("id") === 99, col("v"))))
      .collect().forall(_.isNullAt(0)))
  }

  test("hamming: XOR popcount vs naive sign count; mismatch → NULL") {
    val rnd = new scala.util.Random(3)
    val vs = Seq.fill(6)(Seq.fill(70)(rnd.nextGaussian()))
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val pairs = df.select(col("id").as("i"), VecExprs.signPack(col("v")).as("a"), col("v").as("va"))
      .crossJoin(df.select(col("id").as("j"), VecExprs.signPack(col("v")).as("b"), col("v").as("vb")))
      .select(col("i"), col("j"), VecExprs.hamming(col("a"), col("b")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (i <- vs.indices; j <- vs.indices) {
      val naive = vs(i).zip(vs(j)).count { case (x, y) => (x > 0) != (y > 0) }
      assert(pairs((i.toLong, j.toLong)) == naive, s"pair ($i,$j)")
    }
    // word-count mismatch → NULL (soft error)
    val bad = Seq((Seq(1.0), Seq.fill(70)(1.0))).toDF("a", "b")
      .select(VecExprs.hamming(
        VecExprs.signPack(col("a")), VecExprs.signPack(col("b"))))
    assert(bad.head.isNullAt(0))
  }

  test("matMul: known product, identity, shape mismatch → NULL") {
    val a = Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))          // 2×2
    val i2 = Seq(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val b23 = Seq(Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))) // 2×3
    def mm(x: Seq[Seq[Seq[Double]]], y: Seq[Seq[Seq[Double]]]) =
      x.zip(y).toDF("a", "b")
        .select(VecExprs.matMul(col("a"), col("b")).as("c"))
        .collect()(0)

    val prod = mm(a, b23).getSeq[Seq[Double]](0)
    assert(prod == Seq(Seq(9.0, 12.0, 15.0), Seq(19.0, 26.0, 33.0)))
    assert(mm(a, i2).getSeq[Seq[Double]](0) == Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    // inner-dimension mismatch: A rows have 2 cols, B has 1 row → NULL
    val bad = mm(a, Seq(Seq(Seq(1.0, 2.0))))
    assert(bad.isNullAt(0))
  }

  test("hashEmbed: matches the Column-expression recipe it replaced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = 8
    val df = Seq("alpha beta gamma", "x", "", "a a a b").toDF("t")
    // the pre-native formulation, verbatim
    val toks = split(col("t"), " ")
    val kv = transform(transform(toks, t => md5(t)), h => struct(
      (conv(substring(h, 1, 4), 16, 10).cast("long") % dim).as("b"),
      when(conv(substring(h, 5, 1), 16, 10).cast("long") % 2 === 0,
        lit(1.0)).otherwise(lit(-1.0)).as("s")))
    val legacy = concat(array(size(toks).cast("double")),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        aggregate(kv, lit(0.0), (acc, e) =>
          acc + when(e.getField("b") === d.cast("long"), e.getField("s"))
            .otherwise(lit(0.0)))))
    val both = df.select(
      graft.plans.VecExprs.hashEmbed(col("t"), dim).as("native"),
      legacy.as("legacy")).collect()
    both.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1), r.toString)
    }
    // null text → null embedding
    val n = Seq[Option[String]](None).toDF("t")
      .select(graft.plans.VecExprs.hashEmbed(col("t"), dim)).collect()
    assert(n(0).isNullAt(0))
  }

  test("nearestCentroid: matches the crossJoin + max(struct) recipe it replaced") {
    import spark.implicits._
    // deterministic pseudo-random corpus, incl. exact-duplicate vectors
    // (tie must go to the smallest cid)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(6)(j => ((i * 31 + j * 17) % 13 - 6).toDouble))
    } :+ (200L, Seq.tabulate(6)(j => ((5 * 31 + j * 17) % 13 - 6).toDouble))
    val d = rows.toDF("id", "v")
      .withColumn("n2", VecExprs.dotProduct(col("v"), col("v")))
    val cents = d.select(col("id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
      .orderBy(md5(col("cid").cast("string"))).limit(16).cache()
    // legacy formulation, verbatim
    val legacy = d.crossJoin(broadcast(cents))
      .select(col("id"), col("cid"),
        (VecExprs.dotProduct(col("v"), col("cv")) /
          sqrt(col("n2") * col("cn2"))).as("cc"))
      .groupBy("id")
      .agg(max(struct(col("cc"), (-col("cid")).as("nc"))).as("m"))
      .select(col("id"), (-col("m").getField("nc")).as("cid"))
    val cr = cents.collect().sortBy(_.getLong(0))
    val cids = cr.map(_.getLong(0))
    val flat = cr.flatMap(_.getSeq[Double](1))
    val cn2 = cr.map(_.getDouble(2))
    val native = d.select(col("id"),
      VecExprs.nearestCentroid(col("v"), cids, flat, cn2, 6).as("cid"))
    assert(rowsOf(native) == rowsOf(legacy))
    // null vector → null cid; mismatched length → null cid (soft error)
    val bad = Seq((1L, Some(Seq(1.0, 2.0))), (2L, None))
      .toDF("id", "v")
      .select(VecExprs.nearestCentroid(col("v"), cids, flat, cn2, 6))
      .collect()
    assert(bad.forall(_.isNullAt(0)))

    // zero-norm vector: every cosine is 0/0 = NaN — the native path
    // assigns deterministically (NaN compares equal everywhere, tie →
    // smallest cid), where the legacy Column division THREW
    // DIVIDE_BY_ZERO under ANSI mode (and DuckDB yields NaN) — the
    // native expression is the graceful, oracle-compatible behavior
    val z = Seq((9L, Seq.fill(6)(0.0))).toDF("id", "v")
      .select(VecExprs.nearestCentroid(col("v"), cids, flat, cn2, 6).as("cid"))
      .head
    assert(z.getLong(0) == cids.min)

    // byL2: matches the k-means argmin recipe (max(struct(-dist, -cid)),
    // dist = cn2 − 2·dot) verbatim
    val legacyL2 = d.crossJoin(broadcast(cents))
      .select(col("id"), col("cid"),
        (col("cn2") - lit(2.0) * VecExprs.dotProduct(col("v"), col("cv")))
          .as("dist"))
      .groupBy("id")
      .agg(max(struct((-col("dist")).as("nd"), (-col("cid")).as("nc"))).as("m"))
      .select(col("id"), (-col("m").getField("nc")).as("cid"))
    val nativeL2 = d.select(col("id"),
      VecExprs.nearestCentroid(col("v"), cids, flat, cn2, 6, byL2 = true)
        .as("cid"))
    assert(rowsOf(nativeL2) == rowsOf(legacyL2))
  }
}
