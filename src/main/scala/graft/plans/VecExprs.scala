package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot paths.
  *
  * Spark's own array folds (`aggregate`, `zip_with`, `transform`) are
  * CodegenFallback: every evaluation leaves whole-stage codegen for
  * interpreted eval with per-row closure dispatch and array allocation —
  * ~50× slower in pairwise ANN/dedup scoring loops. The first fix
  * (round 4) unrolled dots into flat `element_at(a,i)*element_at(b,i)`
  * chains, which codegens but costs OnePlanNodePerTerm: a 64-dim dot is
  * a 64-node subtree, repeated per use, so analysis/optimization/AQE
  * re-planning walk thousands of nodes per query — at bench scale the
  * DRIVER became the bottleneck (q_knn_lsh: ~7 s of stages inside ~19 s
  * of wall).
  *
  * [[DotProductExpr]] is the end state: ONE plan node whose doGenCode
  * emits the tight loop. Addition order is ascending-index,
  * left-associative — bit-identical to both the unrolled chain and
  * DuckDB's `list_dot_product`, so oracle hashes are unchanged.
  *
  * Null semantics: NULL array on either side → NULL (standard
  * BinaryExpression null propagation), and MISMATCHED LENGTHS → NULL —
  * a malformed embedding must surface as a visible null, not silently
  * score against a truncated prefix (the zip_with/element_at
  * predecessors both returned NULL here; keeping that contract also
  * keeps Similarity.dot/cosine and rhpBucketSlice honest). Null
  * ELEMENTS are read as 0.0 (primitive accessor) — embeddings with
  * null components are not meaningful inputs; declare them out of
  * scope rather than paying a per-element branch in the hot loop.
  */
object VecExprs {

  /** `vec_dot(a, b)` over array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `mat_mul(a, b)` over array<array<double>> matrix columns
    * (reference: ndarray `@` matmul on expression columns —
    * internals/expression.py:244 `__matmul__` → operator.matmul,
    * numpy-backed in the engine). */
  def matMul(a: Column, b: Column): Column =
    ColumnBridge.column(MatMulExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `hash_embed(text, dim)`: the DocStore stub embedder as one native
    * pass — see [[HashEmbedExpr]]. */
  def hashEmbed(text: Column, dim: Int): Column =
    ColumnBridge.column(HashEmbedExpr(ColumnBridge.expression(text), dim))

  /** `nearest_centroid(v)` against a plan-time constant centroid set —
    * see [[NearestCentroidExpr]]. `cids` must be ascending. */
  def nearestCentroid(v: Column, cids: Array[Long], flat: Array[Double],
      cn2: Array[Double], dim: Int, byL2: Boolean = false): Column =
    ColumnBridge.column(NearestCentroidExpr(
      ColumnBridge.expression(v), cids, flat, cn2, dim, byL2))

  /** [[nearestCentroid]] from a collected `(cid: long, cv, cn2)` row
    * set (any order — sorted ascending here, which is what pins the
    * tie-to-smallest-cid rule). All centroids must share one
    * dimensionality: one embedder produces every vector by contract.
    * NULL or ragged centroid rows FAIL LOUDLY by that contract (a
    * centroid table is a model, not data — a hole in it is caller
    * error, and silently skipping would renumber nothing but still
    * serve a model the caller didn't supply); library-internal centroid
    * samples filter NULL embeddings before reaching here. */
  def nearestCentroidOf(v: Column, rows: Seq[org.apache.spark.sql.Row],
      byL2: Boolean = false): Column = {
    val sorted = rows.sortBy(_.getLong(0))
    require(sorted.nonEmpty, "nearest_centroid: empty centroid set")
    require(!sorted.head.isNullAt(1),
      s"nearest_centroid: NULL centroid vector (cid=${sorted.head.getLong(0)})" +
        " — filter NULL embeddings before fitting/assigning")
    val dim = sorted.head.getSeq[Double](1).length
    val cids = new Array[Long](sorted.length)
    val flat = new Array[Double](sorted.length * dim)
    val cn2 = new Array[Double](sorted.length)
    var i = 0
    sorted.foreach { r =>
      cids(i) = r.getLong(0)
      require(!r.isNullAt(1) && !r.isNullAt(2),
        s"nearest_centroid: NULL centroid vector/norm (cid=${r.getLong(0)})" +
          " — filter NULL embeddings before fitting/assigning")
      val cv = r.getSeq[Double](1)
      require(cv.length == dim,
        s"nearest_centroid: centroid dim ${cv.length} != $dim (cid=${r.getLong(0)}) — " +
          "one embedder must produce all vectors")
      var j = 0
      while (j < dim) { flat(i * dim + j) = cv(j); j += 1 }
      cn2(i) = r.getDouble(2)
      i += 1
    }
    nearestCentroid(v, cids, flat, cn2, dim, byL2)
  }

  /** `pq_encode(v)` against a plan-time constant codebook — see
    * [[PqEncodeExpr]]. `cb` is row-major `[s][j][i]`, `cwn2` `[s][j]`. */
  def pqEncode(v: Column, cb: Array[Double], cwn2: Array[Double],
      m: Int, ksub: Int, dsub: Int): Column =
    ColumnBridge.column(PqEncodeExpr(
      ColumnBridge.expression(v), cb, cwn2, m, ksub, dsub))

  /** `pq_decode(codes)` — see [[PqDecodeExpr]]. */
  def pqDecode(codes: Column, cb: Array[Double],
      m: Int, ksub: Int, dsub: Int): Column =
    ColumnBridge.column(PqDecodeExpr(
      ColumnBridge.expression(codes), cb, m, ksub, dsub))

  /** `sign_pack(v)`: 1-bit sign quantization — see [[SignPackExpr]]. */
  def signPack(v: Column): Column =
    ColumnBridge.column(SignPackExpr(ColumnBridge.expression(v)))

  /** `mmr_select(cands)`: greedy maximal-marginal-relevance selection
    * over a per-query candidate array — see [[MmrSelectExpr]]. */
  def mmrSelect(cands: Column, n: Int, lam: Double): Column =
    ColumnBridge.column(MmrSelectExpr(
      ColumnBridge.expression(cands), n, lam))

  /** `hamming(a, b)` over packed sign codes — see [[HammingExpr]]. */
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(HammingExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** 1-bit sign quantization: bit j of output word w is set iff
  * v[64w + j] > 0 — dim doubles pack into ceil(dim/64) longs, 64×
  * smaller than the array<double> Spark otherwise ships (32× vs float32
  * at rest). Strictly-positive test, so a zero vector packs to zero
  * words, and tail bits of the last word (dim not a multiple of 64)
  * stay 0 on both sides of any comparison — they cancel in XOR.
  *
  * One codegen'd pass; the fold/transform formulation would be
  * CodegenFallback per element (the [[DotProductExpr]] story). NULL
  * vector → NULL. Null elements read as 0.0 (primitive accessor — the
  * file-wide convention). */
case class SignPackExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "sign_pack"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (x.getDouble(i) > 0) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val words = ctx.freshName("words")
      s"""
         |final int $n = $a.numElements();
         |final long[] $words = new long[($n + 63) >>> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getDouble($i) > 0) $words[$i >>> 6] |= (1L << ($i & 63));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPackExpr =
    copy(child = newChild)
}

/** Greedy maximal-marginal-relevance selection (Carbonell & Goldstein
  * 1998) over one query's candidate shortlist — the RAG diversity
  * stage: after ANN ranks by pure relevance, MMR picks `n` results
  * trading relevance against redundancy,
  * mmr(c) = λ·score(c) − (1−λ)·max_{s ∈ selected} cos(c, s)
  * (first pick: λ·score, no penalty term). Input is the collected
  * array<struct<id, s, v>> of ONE query's candidates (k·dim doubles — a
  * top-k shortlist by contract, never a corpus); the greedy loop is
  * inherently sequential in n but O(n·k·dim) per query row, and queries
  * parallelize perfectly.
  *
  * Determinism (the oracle unrolls the same steps as SQL CTEs):
  * candidate ARRAY ORDER is irrelevant — every step scans all remaining
  * candidates, argmax with ties to the smallest id by explicit id
  * comparison (collect_list order never leaks into the result); cosine
  * uses the ascending-index dot ([[DotProductExpr]] order) with
  * candidate-norm-first sqrt; max-over-selected is order-free; λ and
  * 1−λ are both computed from the same double (pick λ with an exact
  * complement — 0.75/0.5/0.25 — for cross-engine literal parity).
  *
  * NULL array → NULL; candidates with a NULL field are skipped; ragged
  * vector dims → NULL (soft error). Fewer than n candidates → all of
  * them. Output: array<struct<id, rank, mmr>> in selection order. */
case class MmrSelectExpr(child: Expression, n: Int, lam: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n > 0, s"mmr_select: n must be > 0, got $n")
  require(lam >= 0 && lam <= 1, s"mmr_select: lambda must be in [0,1], got $lam")

  private val candType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("s", DoubleType),
    org.apache.spark.sql.types.StructField("v", ArrayType(DoubleType))))

  override def inputTypes = Seq(ArrayType(candType))
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("mmr", DoubleType,
        nullable = false))))
  override def prettyName: String = "mmr_select"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val ids = new Array[Long](k)
    val ss = new Array[Double](k)
    val vs = new Array[Array[Double]](k)
    val n2 = new Array[Double](k)
    var dim = -1
    var m = 0
    var i = 0
    while (i < k) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
          val va = row.getArray(2)
          val d = va.numElements()
          if (dim == -1) dim = d
          if (d != dim) return null
          val v = new Array[Double](d)
          var t = 0
          var acc = 0.0
          while (t < d) { v(t) = va.getDouble(t); acc += v(t) * v(t); t += 1 }
          ids(m) = row.getLong(0); ss(m) = row.getDouble(1)
          vs(m) = v; n2(m) = acc
          m += 1
        }
      }
      i += 1
    }
    val oneMinus = 1.0 - lam
    val picks = math.min(n, m)
    val out = new Array[Any](picks)
    val taken = new Array[Boolean](m)
    // max cosine to any selected candidate so far; meaningless until
    // one pick exists (step-0 mmr has no penalty term)
    val maxsim = new Array[Double](m)
    var step = 0
    while (step < picks) {
      var best = 0.0
      var bestI = -1
      var j = 0
      while (j < m) {
        if (!taken(j)) {
          val mmr = if (step == 0) lam * ss(j)
            else lam * ss(j) - oneMinus * maxsim(j)
          // SQLOrderingUtil double order, ties to the smallest id —
          // explicit comparison, so collect_list order can't leak in
          // (the id tie-break also covers compare-equal NaNs, which
          // `mmr == best` alone would miss)
          val dc = if (mmr == best) 0 else java.lang.Double.compare(mmr, best)
          val cmp = if (bestI < 0) 1
            else if (dc != 0) dc
            else java.lang.Long.compare(ids(bestI), ids(j))
          if (cmp > 0) { best = mmr; bestI = j }
        }
        j += 1
      }
      taken(bestI) = true
      out(step) = org.apache.spark.sql.catalyst.InternalRow(
        ids(bestI), step + 1, best)
      // fold the new pick into every remaining candidate's penalty
      var j2 = 0
      while (j2 < m) {
        if (!taken(j2)) {
          var dp = 0.0
          var t = 0
          val vSel = vs(bestI)
          val vC = vs(j2)
          while (t < dim) { dp += vC(t) * vSel(t); t += 1 }
          val sim = dp / math.sqrt(n2(j2) * n2(bestI))
          // Double.compare order, not `>`: a NaN cosine (zero-norm
          // vector) must PROPAGATE like DuckDB's greatest(), not be
          // silently dropped — `sim > maxsim` is false for NaN and
          // would make the penalty depend on selection order
          if (step == 0 ||
            java.lang.Double.compare(sim, maxsim(j2)) > 0) maxsim(j2) = sim
        }
        j2 += 1
      }
      step += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelectExpr =
    copy(child = newChild)
}

/** Hamming distance between two [[SignPackExpr]] code arrays:
  * Σ_w bitCount(a_w XOR b_w) — the pairwise ANN hot loop over binary
  * codes, one codegen'd popcount pass per pair (exact integer, so the
  * ranking has zero float ambiguity). Mismatched word counts → NULL
  * (the malformed-input soft-error convention). Codes do NOT carry the
  * source dim: vectors of different dims that pack into the same word
  * count (e.g. 60 vs 64) compare bit-wise with zero tail bits — mixed-
  * dim corpora are out of contract everywhere in this library (one
  * embedder produces all vectors; the float kernels NULL such pairs
  * only because their arrays happen to expose the length). */
case class HammingExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  private val codesType = ArrayType(org.apache.spark.sql.types.LongType)
  override def inputTypes = Seq(codesType, codesType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "hamming"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingExpr =
    copy(left = newLeft, right = newRight)
}

/** One-pass product-quantization encode: per subspace s, the argmin-L2
  * codeword index (1-based, the codebook's row_number j) via
  * cwn2 − 2·x·c with the row's |x|² constant — the [[NearestCentroidExpr]]
  * byL2 recipe applied m times per row.
  *
  * Replaces the relational encode (subspace posexplode → broadcast
  * codebook join → |corpus|·m·ksub scored rows → struct-max argmin →
  * collect_list reassembly): two aggregations of which the argmin was
  * sort-based (struct buffers don't hash-aggregate), all gone — one
  * scan, no pair rows, no shuffle. Bit-parity: same ascending-index
  * dots over the slice ranges, same SQLOrderingUtil double order, ties
  * to the smallest j by ascending iteration.
  *
  * NULL vector → NULL; length ≠ m·dsub → NULL (soft error). Codebook
  * rides in the expression: m·ksub·dsub doubles = dim·ksub — ~1.5 MB
  * even at dim 768 / ksub 256, always task-binary-sized. */
case class PqEncodeExpr(child: Expression, cb: Array[Double],
    cwn2: Array[Double], m: Int, ksub: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(m > 0 && ksub > 0 && dsub > 0 &&
    cb.length == m * ksub * dsub && cwn2.length == m * ksub,
    "pq_encode: codebook arrays disagree with (m, ksub, dsub)")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != m * dsub) return null
    val v = new Array[Double](m * dsub)
    var i = 0
    while (i < v.length) { v(i) = x.getDouble(i); i += 1 }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0.0
      var bestJ = 0
      var first = true
      var j = 0
      while (j < ksub) {
        var dot = 0.0
        val off = (s * ksub + j) * dsub
        val voff = s * dsub
        i = 0
        while (i < dsub) { dot += v(voff + i) * cb(off + i); i += 1 }
        // argmin dist as argmax of its exact negation — mirrors
        // max(struct(-dist, -j)); see NearestCentroidExpr on the order
        val key = -(cwn2(s * ksub + j) - 2.0 * dot)
        val cmp = if (key == best) 0 else java.lang.Double.compare(key, best)
        if (first || cmp > 0) { best = key; bestJ = j + 1; first = false }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** One-pass PQ decode: concatenate the m selected codewords in subspace
  * order — the reconstructed vector the asymmetric-distance rank dots
  * against. Replaces codes-posexplode → broadcast codebook join →
  * collect_list/array_sort/flatten reassembly with a memcpy per
  * subspace. NULL codes → NULL; a code outside [1, ksub] or a length ≠
  * m → NULL (soft error — the old inner join silently dropped the
  * subspace and produced a short vector, which downstream dots then
  * nulled anyway). */
case class PqDecodeExpr(child: Expression, cb: Array[Double],
    m: Int, ksub: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(m > 0 && ksub > 0 && dsub > 0 && cb.length == m * ksub * dsub,
    "pq_decode: codebook arrays disagree with (m, ksub, dsub)")

  override def inputTypes =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "pq_decode"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != m) return null
    val out = new Array[Double](m * dsub)
    var s = 0
    while (s < m) {
      if (x.isNullAt(s)) return null
      val j = x.getInt(s)
      if (j < 1 || j > ksub) return null
      System.arraycopy(cb, (s * ksub + j - 1) * dsub, out, s * dsub, dsub)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecodeExpr =
    copy(child = newChild)
}

/** One-pass nearest-centroid assignment — the IVF/coarse-quantizer and
  * k-means assignment steps as a single plan node. Two metrics: argmax
  * cosine (`byL2 = false`, the IVF recipe) and argmin L2 via
  * cn2 − 2·dot with |v|² constant per row (`byL2 = true`, the k-means /
  * SemDeDup recipe).
  *
  * The relational formulation (`d crossJoin broadcast(cents)` scored by
  * [[DotProductExpr]], then `max(struct(cc, -cid))` per id) materializes
  * |corpus|·nlist pair rows, and `Max` over a STRUCT buffer is not
  * hash-aggregable, so Spark plans SortAggregate — a full sort of the
  * pair set. nlist grows as √corpus ([[graft.operators.Similarity.nlistFor]]),
  * so index-build cost grew as corpus^1.5 with a sort on top: measured
  * 114 s in ONE stage of q_doc_store_persisted at sf1 (531k chunks ×
  * 1024 centroids = 544M sorted rows) vs ~4 s through this expression.
  * Here each row scans the centroid matrix once in a tight loop —
  * O(nlist·dim) flops per row, zero intermediate rows, zero shuffles,
  * and the downstream `(neighbor_id, cid, dv, dn2)` projection needs no
  * join-back because d's columns never left the row.
  *
  * Bit-parity with the recipe it replaces (and with the DuckDB oracle
  * replays): cc = dot(v,c)/sqrt(n2·cn2) with the same ascending-index
  * dot folds ([[DotProductExpr]]; n2 recomputed here IS the same fold),
  * ties broken to the smallest cid by iterating cids ASCENDING and
  * replacing only on strictly-greater, and double comparison mirroring
  * Spark's SQLOrderingUtil (−0.0 == 0.0, NaN greatest) — the order
  * `max(struct(cc, -cid))` induced.
  *
  * The centroid matrix rides in the expression (task binary → one copy
  * per executor, like a broadcast build side): nlist·dim doubles, e.g.
  * 2^15 lists × 768 dims = 200 MB — the same ceiling the broadcast
  * formulation had. Scale past that by sharding the centroid set, not
  * by reverting to the sort-agg.
  *
  * Null/shape semantics: NULL vector → NULL cid (standard propagation);
  * a vector whose length ≠ `dim` → NULL cid (soft error, the
  * [[DotProductExpr]] mismatched-length convention; the old path's
  * all-null-cc degenerate assigned such rows to the smallest cid —
  * silently junk — and no caller feeds mixed dims: one embedder
  * produces both sides). CodegenFallback: one virtual dispatch per row
  * amortized over O(nlist·dim) arithmetic, the [[MatMulExpr]] contract. */
case class NearestCentroidExpr(child: Expression, cids: Array[Long],
    flat: Array[Double], cn2: Array[Double], dim: Int,
    byL2: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(cids.nonEmpty, "nearest_centroid: empty centroid set")
  require(dim > 0 && flat.length == cids.length * dim && cn2.length == cids.length,
    "nearest_centroid: centroid arrays disagree with dim")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "nearest_centroid"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = x.getDouble(i); i += 1 }
    var n2 = 0.0
    if (!byL2) {
      i = 0
      while (i < dim) { n2 += v(i) * v(i); i += 1 }
    }
    var best = 0.0
    var bestCid = 0L
    var first = true
    var c = 0
    while (c < cids.length) {
      var dot = 0.0
      val off = c * dim
      i = 0
      while (i < dim) { dot += v(i) * flat(off + i); i += 1 }
      // byL2: argmin of dist = cn2 − 2·dot as the argmax of its exact
      // IEEE negation — mirrors max(struct(-dist, -cid)); cosine:
      // argmax of dot/sqrt(n2·cn2) — mirrors max(struct(cc, -cid))
      val cc = if (byL2) -(cn2(c) - 2.0 * dot)
        else dot / math.sqrt(n2 * cn2(c))
      // SQLOrderingUtil.compareDoubles: a == b short-circuit makes
      // -0.0 == 0.0; Double.compare puts NaN above +Inf — the same
      // total order Spark's struct-max used
      val cmp = if (cc == best) 0 else java.lang.Double.compare(cc, best)
      if (first || cmp > 0) { best = cc; bestCid = cids(c); first = false }
      c += 1
    }
    bestCid
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** One-pass md5 hashing-trick text embedding (the [[graft.operators.DocStore]]
  * stub embedder's hot loop as a single plan node).
  *
  * Bit-identical to the Column-expression formulation it replaces
  * (split on ' ' with trailing empties kept; per token, bucket = first
  * four md5 hex digits as an int mod dim, sign = fifth hex digit's
  * parity; output[0] = token count, output[1+d] = Σ ±1 over tokens in
  * bucket d — integer sums in double, so accumulation order can't
  * matter) and to the DuckDB oracle replay of the same recipe. The
  * fold-based original was interpreted O(dim·tokens) per CHUNK —
  * dominant in the DocStore build at scale (the embed stage IS the
  * pipeline's hot loop once parsing and chunking are single-scan);
  * this is O(tokens + dim) with md5 on raw bytes, no hex string, no
  * per-element closure dispatch. CodegenFallback like [[MatMulExpr]]:
  * one virtual dispatch per row amortized over the whole token loop. */
case class HashEmbedExpr(child: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(dim > 0, s"hash_embed: dim must be > 0, got $dim")

  override def inputTypes = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "hash_embed"
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any): Any = {
    val md = HashEmbedExpr.digest.get()
    val s = t.toString
    // split(' ', -1): trailing empties kept — same as Spark's split()
    val toks = s.split(" ", -1)
    val acc = new Array[Double](dim + 1)
    acc(0) = toks.length.toDouble
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first four hex digits = first two bytes; fifth = byte 2's high nibble
      val b = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % dim
      val sign = if ((((d(2) >> 4) & 0xf) % 2) == 0) 1.0 else -1.0
      acc(1 + b) += sign
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbedExpr =
    copy(child = newChild)
}

object HashEmbedExpr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

case class MatMulExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val matType = ArrayType(ArrayType(DoubleType))
  override def inputTypes = Seq(matType, matType)
  override def dataType: DataType = matType
  override def prettyName: String = "mat_mul"

  /** C = A(m×k) · B(k×n); C[i][j] = Σ_l ascending A[i][l]·B[l][j] (the
    * same left-to-right order as [[DotProductExpr]] and DuckDB list_sum,
    * for oracle bit-parity). Shape mismatch (a row of A not exactly k
    * long, ragged B) → NULL, the soft-error convention. CodegenFallback is
    * deliberate here, unlike the dot: the fallback's cost is one virtual
    * dispatch per ROW, amortized over O(m·k·n) arithmetic inside eval —
    * not the per-element dispatch that made fold-based dots slow. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val A = a.asInstanceOf[ArrayData]
    val B = b.asInstanceOf[ArrayData]
    val m = A.numElements()
    val k = B.numElements()
    if (m == 0 || k == 0) return null
    val b0 = B.getArray(0)
    if (b0 == null) return null
    val n = b0.numElements()
    // pre-extract B rows; verify rectangular
    val bRows = new Array[ArrayData](k)
    var l = 0
    while (l < k) {
      val r = B.getArray(l)
      if (r == null || r.numElements() != n) return null
      bRows(l) = r
      l += 1
    }
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val ai = A.getArray(i)
      if (ai == null || ai.numElements() != k) return null
      val row = new Array[Any](n)
      var j = 0
      while (j < n) {
        var acc = 0.0
        var l2 = 0
        while (l2 < k) { acc += ai.getDouble(l2) * bRows(l2).getDouble(j); l2 += 1 }
        row(j) = acc
        j += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatMulExpr =
    copy(left = newLeft, right = newRight)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // inferred result type (AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
