package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative table schema with column properties (reference:
  * internals/schema.py:913 `class Schema` — primary_key, default_value,
  * append_only column properties; `schema_from_csv` inference at :832).
  *
  * Spark already carries the type half (StructType); what the reference
  * adds — and this class restores — is the BEHAVIORAL half:
  *  - `primaryKey` columns become the [[Table]] key,
  *  - `default` fills a column that is NULL or missing entirely,
  *  - `appendOnly` is a checked promise: [[Schema.checkAppendOnly]]
  *    raises when an update mutates an append-only column of an
  *    existing key (same distributed raise-in-filter pattern as
  *    `Table.concat`'s duplicate check — no collect).
  */
final case class ColumnDef(name: String, dtype: DataType,
    primaryKey: Boolean = false, default: Option[Any] = None,
    appendOnly: Boolean = false)

final case class Schema(columns: Seq[ColumnDef]) {

  def structType: StructType =
    StructType(columns.map(c => StructField(c.name, c.dtype)))

  def primaryKey: Seq[String] = columns.filter(_.primaryKey).map(_.name)

  def appendOnlyColumns: Seq[String] = columns.filter(_.appendOnly).map(_.name)

  /** Conform a DataFrame to this schema: add missing defaulted columns,
    * fill NULLs in defaulted columns, cast every declared column to its
    * declared type, project to declared order, key by primaryKey. */
  def apply(df: DataFrame): Table = {
    val out = columns.map { c =>
      val base =
        if (df.columns.contains(c.name)) col(c.name)
        else c.default.map(lit(_)).getOrElse(lit(null))
      val filled = c.default.map(d => coalesce(base, lit(d))).getOrElse(base)
      filled.cast(c.dtype).as(c.name)
    }
    Table.fromDF(df.select(out: _*), primaryKey)
  }
}

object Schema {

  def of(cols: ColumnDef*): Schema = Schema(cols.toSeq)

  /** Sample-based csv schema inference (reference: schema_from_csv,
    * internals/schema.py:832). Only the first `sampleRows` lines are
    * parsed for inference — the full file is never scanned, so this is
    * safe to call on a 100 TB prefix-listed dataset. */
  def fromCsv(spark: SparkSession, path: String, header: Boolean = true,
      sampleRows: Int = 1000, primaryKey: Seq[String] = Nil): Schema = {
    // parse through the csv READER first (it strips each file's own
    // header and handles quoted multi-line records — a raw
    // textFile().limit() sample interleaves other part-files' header
    // lines as data rows and degrades inference to StringType), bound
    // the sample with limit (only enough partitions are read), then run
    // type inference over the small re-written sample — the full
    // dataset is never scanned
    // NOTE: the sample round-trips through a driver-local temp dir —
    // valid in local mode (driver and executors share a filesystem); a
    // distributed deployment must point this at shared storage instead
    val tmpPath = java.nio.file.Files.createTempDirectory("graft_csv_infer")
    val tmp = tmpPath.toString
    try {
      spark.read.option("header", header.toString).csv(path)
        .limit(sampleRows)
        .write.mode("overwrite").option("header", "true").csv(tmp)
      val sampled = spark.read
        .option("header", "true").option("inferSchema", "true").csv(tmp)
      Schema(sampled.schema.fields.toSeq.map(f =>
        ColumnDef(f.name, f.dataType, primaryKey = primaryKey.contains(f.name))))
    } finally {
      // schema is fully materialized above (StructType, not lazy), so
      // deleting the sample dir here is safe
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(tmpPath).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  /** Checked append-only promise: raises if `updated` changed an
    * append-only column for a key present in `old` (new keys may appear
    * freely — that is the append). One co-partitioned join on the key,
    * check lives in a FILTER so Catalyst cannot prune it. */
  def checkAppendOnly(schema: Schema, old: Table, updated: Table): Table = {
    val key = schema.primaryKey
    val ao = schema.appendOnlyColumns.filter(updated.df.columns.contains)
    require(ao.isEmpty || key.nonEmpty,
      "append_only needs a primaryKey: joining on zero key columns would " +
        "cross-join every updated row against every old row")
    if (ao.isEmpty) updated
    else {
      val prev = old.df.select((key ++ ao).map(col): _*)
        .withColumnsRenamed(ao.map(c => c -> s"_old_$c").toMap)
      val checked = updated.df.join(prev, key, "left")
        .filter(
          when(ao.map(c => col(s"_old_$c").isNotNull &&
              !(col(c) <=> col(s"_old_$c"))).reduce(_ || _),
            raise_error(lit("append_only: column mutated for existing key")))
            .otherwise(lit(true)))
        .drop(ao.map(c => s"_old_$c"): _*)
      Table.fromDF(checked, updated.key)
    }
  }
}
