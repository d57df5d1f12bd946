package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Column/row utility operators (reference: stdlib/utils/col.py,
  * stdlib/utils/filtering.py).
  *
  * All are single-shuffle aggregations or pure projections — no windows
  * where an aggregate suffices (min/max over a packed struct gets a
  * map-side partial aggregate; a row_number window would force a full
  * per-partition sort). */
object ColUtils {

  /** Keep each group's row with the maximal `what`
    * (reference: filtering.py:8 argmax_rows). Ties break toward the
    * smallest `tieBreak` value, making the result deterministic (the
    * reference inherits its engine's argmax tie rule; an explicit column
    * is the cross-engine version). Rows with a NULL score lose to any
    * scored row (SQL aggregate convention); NaN scores rank smallest on
    * this negated path (unlike [[argmaxRowsOrdered]], where Spark's
    * NaN-greatest ordering applies) — don't feed NaN to both and expect
    * agreement. */
  def argmaxRows(df: DataFrame, on: Seq[Column], what: Column,
      tieBreak: Column): DataFrame =
    pickRows(df, on, -widenIntegral(df, what), tieBreak)

  /** Keep each group's row with the minimal `what`
    * (reference: filtering.py:20 argmin_rows). NULL scores lose. */
  def argminRows(df: DataFrame, on: Seq[Column], what: Column,
      tieBreak: Column): DataFrame =
    pickRows(df, on, what, tieBreak)

  /** Negating Long.MinValue wraps back to itself under non-ANSI eval,
    * silently inverting the argmax pick — widen integral scores to
    * decimal so `-x` is exact for every input. */
  private def widenIntegral(df: DataFrame, what: Column): Column =
    df.select(what.as("_w")).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        what.cast("decimal(38,0)")
      case _ => what
    }

  /** Keep each group's row maximal by `order`, comparing `order` AS-IS —
    * the path for multi-component struct orders (e.g. Debezium's
    * `struct(ts_ms, offset)`), which [[argmaxRows]] cannot take: its
    * min-based encoding negates the score and unary minus fails analysis
    * on a struct. One max(struct(order, row)) aggregate — the same
    * map-side-combinable single-shuffle shape as [[argmaxRows]]. Rows
    * with a NULL order lose to any ordered row. Ties in `order` break
    * toward the LARGEST remaining row columns in column order (struct
    * comparison just keeps going), so the pick stays deterministic. */
  def argmaxRowsOrdered(df: DataFrame, on: Seq[Column], order: Column): DataFrame = {
    val cols = df.columns.toSeq
    // user columns live INSIDE the `_r` sub-struct: no collision with the
    // internal fields, and getField extraction survives dotted column
    // names that a string-path col("_m.a.b") would misparse
    val packed = struct(order.isNotNull.as("_on"), order.as("_o"),
      struct(cols.map(col): _*).as("_r"))
    df.groupBy(on: _*).agg(max(packed).as("_m"))
      .select(cols.map(c => col("_m").getField("_r").getField(c).as(c)): _*)
  }

  /** min(struct(score, tie, row)) — struct comparison is field-ordered,
    * so this picks the smallest score then the smallest tieBreak, and
    * carries the whole row through one aggregate (no join-back, no
    * window sort). argmax negates the score instead of flipping to max()
    * so the tie direction stays "smallest tieBreak" for both. NULL
    * scores/ties sort LAST (isNull flag fields) — a null can never
    * hijack the pick from a real value. */
  private def pickRows(df: DataFrame, on: Seq[Column], score: Column,
      tieBreak: Column): DataFrame = {
    val cols = df.columns.toSeq
    val packed = struct(
      score.isNull.as("_sn"), score.as("_s"),
      tieBreak.isNull.as("_tn"), tieBreak.as("_t"),
      struct(cols.map(col): _*).as("_r"))
    df.groupBy(on: _*).agg(min(packed).as("_m"))
      .select(cols.map(c => col("_m").getField("_r").getField(c).as(c)): _*)
  }

  /** Majority value of `valueCol` per `group` (reference: col.py:326
    * groupby_reduce_majority). Two aggregations, both map-side
    * combinable; ties break toward the smallest NON-NULL value (a null
    * majority still wins when it has strictly more occurrences — it is
    * the group's genuine mode — but never by tie). Returns
    * (group, majority). */
  def majority(df: DataFrame, group: Column, valueCol: Column): DataFrame =
    df.groupBy(group.as("group"), valueCol.as("majority"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("group"))
      .agg(min_by(col("majority"),
        struct((-col("_n")).as("_nn"), col("majority").isNull.as("_vn"),
          col("majority"))).as("majority"))

  /** Unpack a struct column into top-level columns (reference: col.py:60
    * unpack_col). Pure projection. */
  def unpackCol(df: DataFrame, column: Column, names: String*): DataFrame =
    df.select(names.map(n => column.getField(n).as(n)): _*)
}
