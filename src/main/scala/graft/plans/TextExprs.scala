package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-sketch hot paths. */
object TextExprs {

  /** `winnow(text, k, w)` — the whole Schleimer–Wilkerson–Aiken
    * fingerprint selection as ONE plan node; see [[WinnowExpr]]. */
  def winnow(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))
}

/** One-pass winnowing fingerprint selection (Schleimer et al. 2003).
  *
  * Bit-identical to the Column-expression formulation it replaces —
  * tokens = split on single space with trailing empties kept, shingle
  * hash = lowercase-hex md5 of the space-joined k tokens, window j
  * (1-based, j ≤ max(nsh−w+1, 1)) covers hash positions
  * [j, min(j+w−1, nsh)], selection is the window minimum by
  * (hash ASC, position DESC) (the paper's rightmost-tie density rule),
  * output is the distinct selected (pos, fp) pairs — and to the DuckDB
  * oracle replay (row_number over (hash, pos DESC)).
  *
  * Why native: the HOF formulation (`transform(windows, j ⇒ array_min(
  * transform(sequence(j,…), p ⇒ struct(element_at(hs, p), −p))))`) is
  * not just interpreted — Catalyst inlines the PRODUCING projections
  * into every lambda reference, so each `element_at(hs, p)` re-derives
  * the entire md5 hash array, whose own lambda re-derives `split(text)`
  * per element: O(windows · w · shingles · k) string splits per
  * document where the algorithm needs ONE. Measured: q_text_winnow at
  * sf0.1 went from >240 s (timeout) to sub-second plan time. Here the
  * text is split once, each shingle hashed once, and the windowed
  * argmin runs as a tight O(shingles · w) comparison loop (w is a small
  * constant; the paper's O(n) ring buffer buys nothing at w=4).
  *
  * CodegenFallback like [[HashEmbedExpr]]: one virtual dispatch per row
  * amortized over the whole selection loop. NULL text → NULL. Fewer
  * than k tokens → empty array (no shingles). Returns
  * array<struct<pos: long, fp: string>> with pos the 1-based shingle
  * position, ordered by first selection (callers explode; row order is
  * immaterial downstream). */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(k > 0 && w > 0, s"winnow: need k > 0 and w > 0, got k=$k w=$w")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))))
  override def prettyName: String = "winnow"
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any): Any = {
    val toks = t.toString.split(" ", -1)
    val nsh = toks.length - (k - 1)
    if (nsh <= 0) return new GenericArrayData(Array.empty[Any])
    val md = WinnowExpr.digest.get()
    val hs = new Array[String](nsh)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < nsh) {
      sb.setLength(0)
      var o = 0
      while (o < k) {
        if (o > 0) sb.append(' ')
        sb.append(toks(j + o))
        o += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = WinnowExpr.hexChars((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = WinnowExpr.hexChars(d(b) & 0xf)
        b += 1
      }
      hs(j) = new String(hex)
      j += 1
    }
    val nWin = math.max(nsh - (w - 1), 1)
    // LinkedHashSet: distinct positions in first-selection order — the
    // array_distinct-over-structs semantics of the old formulation
    val sel = new java.util.LinkedHashSet[Integer]
    j = 0
    while (j < nWin) {
      var best = j
      var p = j + 1
      val end = math.min(j + w, nsh)
      while (p < end) {
        // <= : equal hash at a LARGER position wins (rightmost tie)
        if (hs(p).compareTo(hs(best)) <= 0) best = p
        p += 1
      }
      sel.add(best)
      j += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next().intValue()
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        (p + 1).toLong, UTF8String.fromString(hs(p)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {
  private val hexChars = "0123456789abcdef".toCharArray
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
