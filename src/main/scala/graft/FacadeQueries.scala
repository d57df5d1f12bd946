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

  // graft's native kernels callable from PURE SQL (GraftSqlFunctions /
  // spark.sql.extensions=graft.sqlapi.GraftExtensions): the registered
  // functions build the SAME single plan nodes as the Column API — the
  // codegen'd dot kernel, the one-pass shingle/embed expressions — so a
  // SQL-only user (JDBC/Thrift, views) gets the identical plans. DuckDB
  // re-derives every kernel from scratch.
  q("q_sql_native",
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |sh AS (SELECT doc_id,
      |    count(DISTINCT ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2]) AS n_sh
      |  FROM w, UNNEST(range(1, len(ws)-1)) AS t(j) GROUP BY 1),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT w.doc_id, CAST(sh.n_sh AS BIGINT) AS n_sh,
      |  CAST(len(w.ws) AS BIGINT) AS n_tok,
      |  round(list_dot_product(e.v, e.v), 4) AS dd
      |FROM w JOIN sh ON sh.doc_id = w.doc_id
      |JOIN e ON e.vec_id = w.doc_id""") { (s, dir) =>
    graft.sqlapi.GraftSqlFunctions.register(s)
    Sql.sqlDF(s,
      """SELECT d.doc_id,
        |  CAST(size(graft_shingles(d.text, 3)) AS BIGINT) AS n_sh,
        |  CAST(element_at(graft_hash_embed(d.text, 8), 1) AS BIGINT) AS n_tok,
        |  round(graft_dot(CAST(e.embedding AS ARRAY<DOUBLE>),
        |    CAST(e.embedding AS ARRAY<DOUBLE>)), 4) AS dd
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id""".stripMargin,
      "documents" -> load(s, dir, "documents"),
      "embeddings" -> load(s, dir, "embeddings"))
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

  // async UDF path (reference: apply_async, udfs/executors.py async
  // executor; previously UdfsSpec-only): each row's result is computed in
  // a Future on executor threads behind asyncMap's bounded in-flight
  // window — the result set is deterministic, so DuckDB can state it
  // directly.
  q("q_udf_async",
    """SELECT c_custkey, CAST(length(c_name) + c_custkey % 7 AS BIGINT) AS score
      |FROM customer""") { (s, dir) =>
    import s.implicits._
    val ds = load(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      .as[(Long, String)]
    udfs.asyncMap(ds, parallelism = 8) { case (k, name) =>
      scala.concurrent.Future((k, (name.length + k % 7): Long))(
        scala.concurrent.ExecutionContext.global)
    }.toDF("c_custkey", "score")
  }

  // persistent UDF memoization (reference: UdfCaching persistence mode,
  // python_api.rs:3698; previously UdfsSpec-only). The first memoize call
  // computes the even keys into the store; the second call's compute
  // function returns a WRONG value (-1) for any even key it is asked to
  // recompute — so the oracle passes only if every even key was served
  // from the memo and only the odd-key misses were computed.
  q("q_udf_memoize",
    """SELECT DISTINCT o_custkey AS key, CAST(o_custkey * 2 + 1 AS BIGINT) AS enriched
      |FROM orders""") { (s, dir) =>
    val store = java.nio.file.Files.createTempDirectory("graft_memo").toString + "/memo"
    val keys = load(s, dir, "orders").select(col("o_custkey").as("key"))
    udfs.memoize(s, store, keys.filter(col("key") % 2 === 0), "key")(m =>
      m.withColumn("enriched", col("key") * 2 + 1))
    udfs.memoize(s, store, keys, "key")(m =>
      m.withColumn("enriched",
        when(col("key") % 2 === 0, lit(-1L)).otherwise(col("key") * 2 + 1)))
  }

  // custom stateful reducer SPI (reference: custom_reducers.py:174
  // BaseCustomAccumulator; previously ReducersSpec-only): mean-log price
  // as a from-scratch Aggregator — zero/reduce/merge/finish is exactly
  // the from_row/update/compute_result contract, and Spark runs it with
  // map-side partial aggregation like any built-in.
  q("q_custom_reducer",
    """SELECT l_returnflag, round(avg(ln(l_extendedprice)) + 1e-9, 4) AS mean_log_price
      |FROM lineitem GROUP BY 1""") { (s, dir) =>
    import org.apache.spark.sql.{Encoder, Encoders}
    val meanLog = new graft.agg.reducers.CustomReducer[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double): (Double, Long) =
        (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(b: (Double, Long)): Double = b._1 / b._2
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    val meanLogUdaf = udaf(meanLog)
    load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(meanLogUdaf(col("l_extendedprice")) + lit(1e-9), 4)
        .as("mean_log_price"))
  }

  // AsyncTransformer end-to-end (reference: async_transformer.py:282;
  // previously StreamingSpec-only): per-row async invocations over a
  // 2-batch replay — odd keys fail every retry and must be routed to the
  // failure side instead of killing the stream; the oracle states the
  // settled (status, score) outcome for every key.
  q("q_async_transformer",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 2 = 0 THEN 'ok' ELSE 'failed' END AS status,
      |  CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey * 3 AS BIGINT) END AS score
      |FROM orders""") { (s, dir) =>
    import s.implicits._
    import scala.concurrent.duration._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val keys = load(s, dir, "orders").select(col("o_orderkey")).as[Long].collect()
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val ok = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = udfs.asyncTransformer(in.toDS(), parallelism = 8, retries = 1,
        timeout = 30.seconds) { k =>
        if (k % 2 == 0) scala.concurrent.Future.successful((k, k * 3))
        else scala.concurrent.Future.failed(new RuntimeException("odd key"))
      } { (succ, fail, _) =>
        succ.collect().foreach(ok.add); fail.collect().foreach(bad.add)
      }
    try {
      val (a, b) = keys.splitAt(keys.length / 2)
      in.addData(a.toSeq); q.processAllAvailable()
      in.addData(b.toSeq); q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    ok.asScala.toSeq.toDF("o_orderkey", "score")
      .select(col("o_orderkey"), lit("ok").as("status"), col("score"))
      .unionByName(bad.asScala.toSeq.toDF("o_orderkey")
        .select(col("o_orderkey"), lit("failed").as("status"),
          lit(null).cast("bigint").as("score")))
  }

  // demo stream generator (reference: pw.demo.range_stream; previously
  // spec-only) — the deterministic (id, value) ramp every docs example
  // starts from.
  q("q_range_rows",
    """SELECT CAST(range AS BIGINT) AS id, CAST(range AS DOUBLE) AS value
      |FROM range(200)""") { (s, _) =>
    graft.testkit.Testkit.rangeRows(s, 200).df
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
