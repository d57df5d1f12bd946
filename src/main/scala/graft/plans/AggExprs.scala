package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BitwiseXor, Concat, EqualTo, Expression, Hex, If, ImplicitCastInputTypes, IsNull, LessThan, Literal, Lower, Or, StringLPad, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst AGGREGATE functions for the dedup hot paths. */
object AggExprs {

  /** `min_hex32(h)` — min over 32-char lowercase-hex strings (md5
    * output), bit-identical to `min(h)` but HASH-aggregable; see
    * [[MinHex32Agg]]. */
  def minHex32(h: Column): Column =
    ColumnBridge.column(
      MinHex32Agg(ColumnBridge.expression(h)).toAggregateExpression())
}

/** 16-hex-char slice of a 32-char lowercase-hex string as a sign-BIASED
  * long: bits = the unsigned 64-bit value of chars [offset, offset+16),
  * XOR'd with Long.MinValue so SIGNED long comparison equals unsigned
  * (= lexicographic-on-fixed-width-hex) order. The decode half of
  * [[MinHex32Agg]]'s fixed-width buffer encoding. Input is trusted to
  * be well-formed md5 hex (the only producer); NULL → NULL. */
case class HexSliceBiased(child: Expression, offset: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(offset == 0 || offset == 16, s"hex_slice_biased: offset 0|16, got $offset")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hex_slice_biased"

  override protected def nullSafeEval(s: Any): Any =
    HexSliceBiased.slice(s.asInstanceOf[UTF8String], offset)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.HexSliceBiased$$.MODULE$$.slice($s, $offset);")

  override protected def withNewChildInternal(newChild: Expression): HexSliceBiased =
    copy(child = newChild)
}

object HexSliceBiased {
  /** Parse 16 lowercase-hex chars starting at byte `off` into a biased
    * long. Hex chars are ASCII, so byte offsets equal char offsets.
    * Fails loudly on anything that is not EXACTLY 32 chars of lowercase
    * hex: a truncated/longer digest (sha1/sha256 fed by mistake) or an
    * uppercase hex string would otherwise produce a silently wrong min
    * (uppercase reconstructs as lowercase — no longer bit-identical to
    * min(STRING) on the inputs). */
  def slice(s: UTF8String, off: Int): Long = {
    if (s.numBytes() != 32)
      throw new IllegalArgumentException(
        s"min_hex32 expects 32-char lowercase hex (md5 output), got " +
          s"${s.numBytes()} bytes: '$s'")
    var v = 0L
    var i = off
    val end = off + 16
    while (i < end) {
      val c = s.getByte(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else throw new IllegalArgumentException(
          s"min_hex32 expects lowercase hex (md5 output), got '$s'")
      v = (v << 4) | d
      i += 1
    }
    v ^ Long.MinValue
  }
}

/** Hash-aggregable `min` over 32-char lowercase-hex strings (md5
  * output) — bit-identical results to `min(STRING)`, but the
  * aggregation buffer is TWO nullable longs (the biased 64-bit halves
  * of the digest, [[HexSliceBiased]]) instead of the string itself.
  *
  * Why: Spark's `Min` over StringType carries the string in its agg
  * buffer, and HashAggregateExec only takes fixed-width mutable buffer
  * types — so every `min(md5(...))` aggregation plans a SortAggregate
  * that SORTS its whole input (the CLAUDE.md min(STRING) trap; in the
  * batch MinHash paths that input is the exploded corpus shingle
  * table). Fixed-length lowercase hex is order-isomorphic to the
  * unsigned 128-bit digest, which is order-isomorphic to the pair of
  * sign-biased longs compared lexicographically — so min commutes with
  * the encoding, and the hex is reconstructed exactly once per GROUP in
  * [[evaluateExpression]] (lpad(hex(...)) per half, lowercased).
  * The whole thing is DeclarativeAggregate over codegen'd built-ins:
  * HashAggregate + whole-stage codegen throughout.
  *
  * The DF-capped batch dedup paths ([[graft.operators.Dedup.minhash]])
  * need aggregation — the stop-shingle cap is a corpus-frequency join
  * the in-row [[MinHashSigExpr]] kernel cannot see; this makes that
  * aggregation hash-based. NULL inputs are ignored; an empty/all-NULL
  * group yields NULL (the `Min` contract). */
case class MinHex32Agg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression]
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_hex32"

  private lazy val bh = AttributeReference("bh", LongType)()
  private lazy val bl = AttributeReference("bl", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bh, bl)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(null, LongType))

  override lazy val updateExpressions: Seq[Expression] = {
    val ih = HexSliceBiased(child, 0)
    val il = HexSliceBiased(child, 16)
    val replace = If(IsNull(child), Literal(false),
      If(IsNull(bh), Literal(true),
        Or(LessThan(ih, bh), And(EqualTo(ih, bh), LessThan(il, bl)))))
    Seq(If(replace, ih, bh), If(replace, il, bl))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val replace = If(IsNull(bh.right), Literal(false),
      If(IsNull(bh.left), Literal(true),
        Or(LessThan(bh.right, bh.left),
          And(EqualTo(bh.right, bh.left), LessThan(bl.right, bl.left)))))
    Seq(If(replace, bh.right, bh.left), If(replace, bl.right, bl.left))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(bh), Literal(null, StringType),
      Lower(Concat(Seq(hex16(bh), hex16(bl)))))

  /** Biased long → 16 uppercase hex chars (Hex prints the UNSIGNED
    * 64-bit value of the un-biased bits, no leading zeros → lpad). */
  private def hex16(e: Expression): Expression =
    StringLPad(Hex(BitwiseXor(e, Literal(Long.MinValue))),
      Literal(16), Literal("0"))

  override protected def withNewChildInternal(newChild: Expression): MinHex32Agg =
    copy(child = newChild)
}
