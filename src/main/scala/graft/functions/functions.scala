package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression surface of the graft engine.
  *
  * Mirrors the reference's expression AST and method namespaces
  * (reference: python/pathway/internals/expression.py:88,
  * python/pathway/internals/expressions/{string,date_time,numerical}.py,
  * src/engine/expression.rs) re-expressed as Spark `Column` combinators so
  * everything stays inside Catalyst whole-stage codegen — no UDFs on the
  * hot path.
  */
object functions {

  // ---------------------------------------------------------------------
  // Pointers / row identity
  // ---------------------------------------------------------------------

  /** Stable 128-bit pointer derived from the given columns.
    *
    * Mirrors `Key::for_values` (reference: src/engine/value.rs:50-60) and
    * `pointer_from` (reference: python/pathway/internals/table.py:2371).
    * Canonical encoding = JSON of a struct (type-tagged by field), hashed
    * with MD5 → 16-byte binary. Both `to_json` and `md5` are codegen'd
    * built-ins, so this stays in whole-stage codegen and is identical on
    * every executor — safe to use as a shuffle/join key at any scale.
    */
  def pointer_from(cols: Column*): Column =
    unhex(md5(to_json(struct(cols: _*)))).as("ptr")

  /** Pointer with an instance / partition discriminator
    * (reference: expression.rs AnyExpression::OptionalPointerFrom). */
  def pointer_from_instance(instance: Column, cols: Column*): Column =
    pointer_from((instance +: cols): _*)

  /** Cheap 64-bit shard key (for salting / bucketing decisions). */
  def shard_of(cols: Column*): Column = xxhash64(cols: _*)

  // ---------------------------------------------------------------------
  // Control-flow expressions (reference: internals/common.py)
  // ---------------------------------------------------------------------

  /** `if_else(cond, then, else)` (reference: common.py:328). */
  def if_else(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(cond, ifTrue).otherwise(ifFalse)

  /** First non-null (reference: common.py:277). */
  def coalesce_(cols: Column*): Column = coalesce(cols: _*)

  /** `require(value, *deps)` — value if all deps non-null, else null
    * (reference: common.py:302). */
  def require(value: Column, deps: Column*): Column =
    when(deps.map(_.isNotNull).reduce(_ && _), value)

  /** `unwrap(col)` — assert non-null, error otherwise
    * (reference: common.py:399). */
  def unwrap(c: Column): Column =
    when(c.isNull, raise_error(lit("unwrap: value is null"))).otherwise(c)

  /** `fill_error(col, default)` — the reference routes Value::Error to a
    * default (reference: common.py:438). Spark's analog of soft errors is
    * the `try_*` function family producing NULL; fill_error is then
    * coalesce with the fallback. */
  def fill_error(c: Column, default: Column): Column = coalesce(c, default)

  /** `make_tuple` (reference: common.py:361). */
  def make_tuple(cols: Column*): Column = struct(cols: _*)

  /** Tuple / array `.get(i, default)` (reference: expression.py:994). */
  def get_or(arr: Column, i: Int, default: Column): Column =
    coalesce(try_element_at(arr, lit(i + 1)), default)

  /** JSON path get returning string (reference: JsonGetItem,
    * src/engine/expression.rs:386-408). */
  def json_get(c: Column, path: String): Column =
    get_json_object(c, "$." + path)

  /** Typed JSON extraction (reference: JsonToOptional,
    * src/engine/expression.rs:115; tests/test_json.py): the value at
    * `path` cast to `dtype`, NULL when the path is absent or the value
    * doesn't convert — the reference's Optional soft-error semantics
    * (`as_int()` etc. return None on mismatch, never raise). try_cast is
    * codegen'd, so the typed path stays inside whole-stage codegen. */
  def json_typed(c: Column, path: String, dtype: org.apache.spark.sql.types.DataType): Column =
    get_json_object(c, "$." + path).try_cast(dtype)

  /** Whole-document typed parse (reference: Json value type,
    * src/engine/value.rs:225): parse the JSON string against an explicit
    * struct schema; fields that are absent or mistyped come back NULL
    * (PERMISSIVE mode), mirroring JsonToOptional per field. Use
    * `json_object(c, schema)("field")` for typed field access. */
  def json_object(c: Column, schema: org.apache.spark.sql.types.StructType): Column =
    from_json(c, schema)

  // ---------------------------------------------------------------------
  // .str namespace (reference: internals/expressions/string.py)
  // ---------------------------------------------------------------------
  implicit final class StrOps(private val c: Column) {
    def strLower: Column = lower(c)
    def strUpper: Column = upper(c)
    def strReversed: Column = reverse(c)
    def strLen: Column = length(c)
    def strReplace(old: Column, nw: Column): Column = replace(c, old, nw)
    def strStartsWith(p: Column): Column = c.startsWith(p)
    def strEndsWith(p: Column): Column = c.endsWith(p)
    def strSwapCase: Column = {
      // no built-in; compose: flip case char-wise via translate of A-Z/a-z
      val up = ('A' to 'Z').mkString + ('a' to 'z').mkString
      val lo = ('a' to 'z').mkString + ('A' to 'Z').mkString
      translate(c, up, lo)
    }
    def strStrip: Column = trim(c)
    def strTitle: Column = initcap(c)
    def strCount(sub: Column): Column =
      when(length(sub) === 0, lit(null))
        .otherwise((length(c) - length(replace(c, sub, lit("")))) / length(sub))
        .cast("long")
    def strFind(sub: Column): Column =
      (call_function("instr", c, sub) - 1).cast("long")
    /** Last occurrence (0-based, -1 if absent) — reverse both strings,
      * find first, map back. */
    def strRFind(sub: Column): Column = {
      val pos = call_function("instr", reverse(c), reverse(sub))
      when(pos > 0, (length(c) - pos - length(sub) + 1).cast("long"))
        .otherwise(lit(-1L))
    }
    def strRemovePrefix(p: Column): Column =
      when(c.startsWith(p), substring(c, length(p) + 1, length(c))).otherwise(c)
    def strRemoveSuffix(p: Column): Column =
      when(c.endsWith(p), substring(c, lit(1), length(c) - length(p))).otherwise(c)
    def strSlice(from: Int, until: Int): Column =
      substring(c, from + 1, until - from)
    def parseInt: Column = try_cast(c, "long")
    def parseFloat: Column = try_cast(c, "double")
    def parseBool: Column = try_cast(c, "boolean")
  }

  private def try_cast(c: Column, t: String): Column = c.try_cast(t)
  private def try_element_at(arr: Column, i: Column): Column =
    org.apache.spark.sql.functions.try_element_at(arr, i)

  // ---------------------------------------------------------------------
  // .dt namespace (reference: internals/expressions/date_time.py)
  // ---------------------------------------------------------------------
  implicit final class DtOps(private val c: Column) {
    def dtYear: Column = year(c)
    def dtMonth: Column = month(c)
    def dtDay: Column = dayofmonth(c)
    def dtHour: Column = hour(c)
    def dtMinute: Column = minute(c)
    def dtSecond: Column = second(c)
    def dtWeekday: Column = weekday(c) // Monday=0, matches reference
    def dtStrftime(fmt: String): Column = date_format(c, fmt)
    def dtStrptime(fmt: String): Column = to_timestamp(c, fmt)
    def dtTimestampSec: Column = unix_timestamp(c)
    def dtTimestampMillis: Column = unix_millis(c.cast("timestamp"))
    def dtFromTimestamp: Column = timestamp_seconds(c)
    def dtToUtc(tz: String): Column = to_utc_timestamp(c, tz)
    def dtToNaiveInTz(tz: String): Column = from_utc_timestamp(c, tz)
    /** Round to the NEAREST unit boundary (reference .dt.round — pandas
      * round semantics, ties up). Defined for fixed-width units only;
      * month/quarter/year have no fixed width to halve (the reference's
      * round rejects them too) — use [[dtFloor]] there. */
    def dtRound(unit: String): Column = {
      val micros: Long = unit.toLowerCase match {
        case "second" | "sec" => 1000000L
        case "minute" | "min" => 60L * 1000000L
        case "hour" => 3600L * 1000000L
        case "day" => 86400L * 1000000L
        case "week" => 7L * 86400L * 1000000L
        case u => throw new IllegalArgumentException(
          s"dt.round: '$u' is not a fixed-width unit — use dtFloor")
      }
      // floor(x + half) in pure LONG arithmetic (pmod is non-negative, so
      // subtracting it floors toward -inf even pre-epoch) — no double
      // round-trip, exact at any epoch magnitude
      val shifted = unix_micros(c.cast("timestamp")) + lit(micros / 2)
      timestamp_micros(shifted - pmod(shifted, lit(micros)))
    }
    def dtFloor(unit: String): Column = date_trunc(unit, c)
    def dtAddDuration(d: Column): Column = c + d
    def dtSubDuration(d: Column): Column = c - d
  }

  // ---------------------------------------------------------------------
  // .num namespace (reference: internals/expressions/numerical.py)
  // ---------------------------------------------------------------------
  implicit final class NumOps(private val c: Column) {
    def numAbs: Column = abs(c)
    def numRound(n: Int): Column = round(c, n)
    def numFillNa(default: Column): Column = coalesce(nanvl(c, default), default)
  }
}
