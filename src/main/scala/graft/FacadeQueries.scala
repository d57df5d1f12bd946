package graft

import org.apache.spark.sql.functions._
import graft.core.Table
import graft.operators.Multimodal
import graft.sqlapi.Sql
import graft.SparkEntry.{load, table}

/** Oracle-checked queries for the sql() façade, the UDF surface and the
  * multimodal asset pipeline. */
object FacadeQueries extends QueryModule {

  // sql(query, **tables) façade (reference: internals/sql.py:613) — the
  // query text below is valid in both Spark SQL and DuckDB, so it doubles
  // as its own oracle.
  q("q_sql",
    """SELECT n_name, count(*) AS n_cust,
      |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE), 4) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 0
      |GROUP BY n_name
      |HAVING count(*) > 5""") { (s, dir) =>
    Sql.sql(s,
      """SELECT n_name, count(*) AS n_cust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE), 4) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 0
        |GROUP BY n_name
        |HAVING count(*) > 5""".stripMargin,
      "customer" -> table(s, dir, "customer", "c_custkey"),
      "nation" -> table(s, dir, "nation", "n_nationkey"))
  }

  // scalar UDF via the wrapper (reference: @pw.udf, common.py:96 apply) —
  // digit sum of the order key; DuckDB mirrors it with a char-level list
  q("q_udf_apply",
    """SELECT o_orderkey,
      |  CAST(list_sum(list_transform(range(length(CAST(o_orderkey AS VARCHAR))),
      |    i -> CAST(CAST(o_orderkey AS VARCHAR)[i+1] AS INTEGER))) AS BIGINT)
      |    AS digit_sum
      |FROM orders""") { (s, dir) =>
    val digitSum = udfs.udf1[Long, Long](n =>
      n.toString.map(_ - '0').map(_.toLong).sum)
    load(s, dir, "orders")
      .select(col("o_orderkey"), digitSum(col("o_orderkey")).as("digit_sum"))
  }

  // multimodal decode: binary assets -> partition-wise feature extraction
  // (documents' UTF-8 bytes stand in for image payloads; ASCII text means
  // the DuckDB codepoint mirror sees the same byte values)
  q("q_multimodal_decode",
    """WITH c AS (SELECT doc_id,
      |  list_transform(range(length(text)), i -> unicode(text[i+1])) AS cs
      |  FROM documents)
      |SELECT doc_id, CAST(len(cs) AS BIGINT) AS n_bytes,
      |  CAST(list_sum(cs) AS BIGINT) AS byte_sum,
      |  round(list_sum(cs) * 1.0 / len(cs) + 1e-9, 4) AS mean_byte,
      |  CAST(len(list_filter(cs, x -> x < 64)) AS BIGINT) AS h0,
      |  CAST(len(list_filter(cs, x -> x >= 64 AND x < 96)) AS BIGINT) AS h1,
      |  CAST(len(list_filter(cs, x -> x >= 96 AND x < 112)) AS BIGINT) AS h2,
      |  CAST(len(list_filter(cs, x -> x >= 112)) AS BIGINT) AS h3
      |FROM c""") { (s, dir) =>
    val assets = Multimodal.toAssets(load(s, dir, "documents"),
      col("doc_id"), col("text"), "image/fake")
    Multimodal.extractFeatures(assets).toDF()
      .select(col("id").as("doc_id"), col("n_bytes"), col("byte_sum"),
        round(col("mean_byte") + lit(1e-9), 4).as("mean_byte"),
        col("h0"), col("h1"), col("h2"), col("h3"))
  }

  // frame sampling: every 2nd 32-byte block as a "frame"
  q("q_multimodal_frames",
    """WITH c AS (SELECT doc_id,
      |  list_transform(range(length(text)), i -> unicode(text[i+1])) AS cs
      |  FROM documents)
      |SELECT doc_id, CAST(j AS BIGINT) AS frame_idx,
      |  CAST(list_sum(cs[j*32+1 : j*32+32]) AS BIGINT) AS frame_sum
      |FROM c, UNNEST(range(len(cs) // 32)) AS t(j)
      |WHERE j % 2 = 0""") { (s, dir) =>
    val assets = Multimodal.toAssets(load(s, dir, "documents"),
      col("doc_id"), col("text"), "video/fake")
    Multimodal.frameSample(assets, frameBytes = 32, stride = 2).toDF()
      .select(col("id").as("doc_id"), col("frame_idx"), col("frame_sum"))
  }
}
