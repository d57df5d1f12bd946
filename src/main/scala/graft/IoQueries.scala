package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkEntry.load
import graft.sources.io

/** Driver-checked fs-connector round-trips (reference:
  * python/pathway/io/fs/__init__.py:33 — csv, jsonlines, plaintext).
  *
  * Each query WRITES a copy of a small parquet table in the connector's
  * format, then reads it back through `graft.sources.io` — exercising the
  * full read+write path, not just the format-string mapping. The oracle
  * reads the same files with DuckDB's read_csv/read_json, so the compare
  * proves Spark's writer/reader and DuckDB agree on the bytes.
  *
  * Paths are keyed by the SF-dir basename: the driver correctness-checks
  * at sf0.01 (the path hardcoded in the oracle SQL), while bench runs at
  * other SFs write elsewhere and can never clobber the checked files
  * between the Verify dump and the driver's DuckDB pass.
  */
object IoQueries extends QueryModule {

  private def ioDir(dir: String) =
    s"/tmp/graft_io/${new java.io.File(dir).getName}"

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", LongType), StructField("n_name", StringType),
    StructField("n_regionkey", LongType)))

  q("q_io_csv",
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM read_csv('/tmp/graft_io/sf0.01/nation_csv/*.csv', header=true)""") { (s, dir) =>
    val out = s"${ioDir(dir)}/nation_csv"
    io.write(load(s, dir, "nation").coalesce(1), out, "csv",
      options = Map("header" -> "true"))
    io.csv(s, out, schema = nationSchema, key = Seq("n_nationkey")).df
  }

  q("q_io_jsonlines",
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM read_json('/tmp/graft_io/sf0.01/nation_json/*.json')""") { (s, dir) =>
    val out = s"${ioDir(dir)}/nation_json"
    io.write(load(s, dir, "nation").coalesce(1), out, "json")
    io.jsonlines(s, out, schema = nationSchema, key = Seq("n_nationkey")).df
  }

  q("q_io_text",
    """SELECT value FROM read_csv('/tmp/graft_io/sf0.01/nation_txt/*.txt',
      |  delim='', quote='', escape='', header=false,
      |  columns={'value': 'VARCHAR'})""") { (s, dir) =>
    val out = s"${ioDir(dir)}/nation_txt"
    io.write(load(s, dir, "nation").select(col("n_name")).coalesce(1),
      out, "text")
    io.plaintext(s, out).df
  }
}
