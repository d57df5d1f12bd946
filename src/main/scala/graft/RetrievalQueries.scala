package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Bm25, Dedup, Temporal}
import graft.SparkEntry.{load, loadEvents}

/** Oracle-checked queries for full-text retrieval (BM25), hybrid-index
  * fusion (RRF), fuzzy join, and the right/outer temporal-join variants.
  */
object RetrievalQueries extends QueryModule {

  private def r4e(c: org.apache.spark.sql.Column) = round(c + lit(1e-9), 4)

  // BM25 scoring + deterministic top-5 (ranking over ROUNDED scores:
  // raw-score ordering would let last-ulp summation differences between
  // engines reorder near-ties)
  q("q_bm25",
    """WITH toks AS (SELECT doc_id AS id, unnest(string_split(text,' ')) AS term
      |  FROM documents),
      |post AS (SELECT term, id, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT id, count(*) AS len FROM toks GROUP BY 1),
      |st AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
      |dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |q AS (SELECT doc_id AS qid,
      |  unnest(list_distinct(string_split(text,' ')[1:5])) AS term
      |  FROM documents WHERE doc_id < 5),
      |sc AS (SELECT qid, id,
      |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
      |    * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avgdl)))
      |    + 1e-9, 4) AS score
      |  FROM q JOIN post USING (term) JOIN dfreq USING (term)
      |  JOIN dl USING (id) CROSS JOIN st GROUP BY 1, 2),
      |r AS (SELECT qid, id, score,
      |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
      |  FROM sc)
      |SELECT qid, rank, id, score FROM r WHERE rank <= 5""") { (s, dir) =>
    val docs = load(s, dir, "documents")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext"))
    val scored = Bm25.score(docs, col("doc_id"), col("text"),
        queries, col("qid"), col("qtext"))
      .withColumn("score", r4e(col("score")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("qid", "rank", "id", "score")
  }

  // TF-IDF cosine scoring + deterministic top-5 (smoothed-idf doc
  // weights, L2-normalized doc vectors, binary query weights; ranking
  // over ROUNDED scores for the same cross-engine stability as q_bm25)
  q("q_tfidf",
    """WITH toks AS (SELECT doc_id AS id, unnest(string_split(text,' ')) AS term
      |  FROM documents),
      |post AS (SELECT term, id, count(*) AS tf FROM toks GROUP BY 1, 2),
      |nd AS (SELECT count(DISTINCT id) AS n FROM post),
      |dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |w AS (SELECT term, id, tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS w
      |  FROM post JOIN dfreq USING (term) CROSS JOIN nd),
      |nrm AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
      |q AS (SELECT doc_id AS qid,
      |  unnest(list_distinct(string_split(text,' ')[1:5])) AS term
      |  FROM documents WHERE doc_id < 5),
      |sc AS (SELECT qid, id, round(sum(w) / max(nrm) + 1e-9, 4) AS score
      |  FROM q JOIN w USING (term) JOIN nrm USING (id) GROUP BY 1, 2),
      |r AS (SELECT qid, id, score,
      |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
      |  FROM sc)
      |SELECT qid, rank, id, score FROM r WHERE rank <= 5""") { (s, dir) =>
    val docs = load(s, dir, "documents")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext"))
    val scored = Bm25.tfidfScore(docs, col("doc_id"), col("text"),
        queries, col("qid"), col("qtext"))
      .withColumn("score", r4e(col("score")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("qid", "rank", "id", "score")
  }

  // RRF fusion of two retrievers (reference: hybrid_index.py:14): BM25
  // ranking fused with the same candidates re-ranked by id
  q("q_rrf_fuse",
    """WITH toks AS (SELECT doc_id AS id, unnest(string_split(text,' ')) AS term
      |  FROM documents),
      |post AS (SELECT term, id, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT id, count(*) AS len FROM toks GROUP BY 1),
      |st AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
      |dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |q AS (SELECT doc_id AS qid,
      |  unnest(list_distinct(string_split(text,' ')[1:5])) AS term
      |  FROM documents WHERE doc_id < 5),
      |sc AS (SELECT qid, id,
      |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
      |    * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avgdl)))
      |    + 1e-9, 4) AS score
      |  FROM q JOIN post USING (term) JOIN dfreq USING (term)
      |  JOIN dl USING (id) CROSS JOIN st GROUP BY 1, 2),
      |r1 AS (SELECT qid, id,
      |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
      |  FROM sc QUALIFY rank <= 5),
      |r2 AS (SELECT qid, id,
      |  row_number() OVER (PARTITION BY qid ORDER BY id) AS rank FROM r1)
      |SELECT qid, id,
      |  round(sum(1.0 / (60 + rank)) + 1e-9, 4) AS rrf_score
      |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
      |GROUP BY 1, 2""") { (s, dir) =>
    val docs = load(s, dir, "documents")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext"))
    val scored = Bm25.score(docs, col("doc_id"), col("text"),
        queries, col("qid"), col("qtext"))
      .withColumn("score", r4e(col("score")))
    val w1 = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    val r1 = graft.core.Caches.cache(scored.withColumn("rank", row_number().over(w1))
      .filter(col("rank") <= 5).select("qid", "id", "rank"))
    val w2 = Window.partitionBy("qid").orderBy(col("id").asc)
    val r2 = r1.withColumn("rank", row_number().over(w2))
      .select("qid", "id", "rank")
    Bm25.rrfFuse(60, r1, r2)
      .select(col("qid"), col("id"), r4e(col("rrf_score")).as("rrf_score"))
  }

  // DataIndex/as_retriever façade end-to-end (reference:
  // data_index.py:278 + hybrid_index.py:14; previously DataIndexSpec-
  // only): exact brute-force and LSH retrievers over the same corpus,
  // RRF-fused by the hybrid retriever. The LSH side derives its plane
  // count from the corpus (planesFor(n, 8)) and the oracle derives the
  // SAME count from its own count(*) — scale-correct at any sf — and
  // keeps its self-match (the façade's LSH path doesn't exclude the
  // query row; brute force does).
  q("q_hybrid_retriever",
    """WITH w AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |np AS (SELECT greatest(1,
      |  CAST(ceil(log2(count(*) / 8.0) - 1e-9) AS INT)) AS pp FROM w),
      |q AS (SELECT id AS qid, v AS qv FROM w WHERE id % 50 = 0),
      |bf AS (SELECT qid, id,
      |  row_number() OVER (PARTITION BY qid ORDER BY c DESC, id) AS rank
      |  FROM (SELECT q.qid, w.id,
      |    list_dot_product(qv, v)
      |      / sqrt(list_dot_product(qv, qv) * list_dot_product(v, v)) AS c
      |    FROM q JOIN w ON qid != id)
      |  QUALIFY rank <= 3),
      |pr AS (SELECT id, p,
      |  list_sum(list_transform(range(64), d -> v[d+1] *
      |    (CASE WHEN CAST('0x' || substr(md5(p || '_' || d), 1, 2) AS INTEGER) % 2 = 0
      |          THEN 1.0 ELSE -1.0 END))) AS proj
      |  FROM w CROSS JOIN np, UNNEST(range(np.pp)) AS t(p)),
      |bk AS (SELECT id, CAST(sum(CASE WHEN proj >= 0 THEN 1 << p ELSE 0 END) AS BIGINT)
      |  AS bucket FROM pr GROUP BY id),
      |bv AS (SELECT w.id, w.v, bk.bucket FROM w JOIN bk ON w.id = bk.id),
      |ls AS (SELECT qid, id,
      |  row_number() OVER (PARTITION BY qid ORDER BY c DESC, id) AS rank
      |  FROM (SELECT x.id AS qid, y.id AS id,
      |    list_dot_product(x.v, y.v)
      |      / sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v)) AS c
      |    FROM bv x JOIN bv y ON x.bucket = y.bucket
      |    WHERE x.id % 50 = 0)
      |  QUALIFY rank <= 3),
      |fused AS (SELECT qid, id, sum(1.0 / (60 + rank)) AS rrf
      |  FROM (SELECT * FROM bf UNION ALL SELECT * FROM ls) GROUP BY 1, 2)
      |SELECT qid, rank, id, round(rrf + 1e-9, 4) AS score
      |FROM (SELECT qid, id, rrf,
      |  row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS rank
      |  FROM fused)
      |WHERE rank <= 3""") { (s, dir) =>
    import graft.operators.DataIndex
    val emb = load(s, dir, "embeddings")
    val retriever = DataIndex.hybrid(
      DataIndex.bruteForce(emb, col("vec_id"), col("embedding"), dim = 64),
      DataIndex.lsh(emb, col("vec_id"), col("embedding"), dim = 64,
        targetBucketSize = 8))
    retriever.retrieve(emb.filter(col("vec_id") % 50 === 0),
        col("vec_id"), col("embedding"), k = 3)
      .select(col("qid"), col("rank"), col("id"), r4e(col("score")).as("score"))
  }

  // kNN classification (reference knn_lsh_classify): every 50th vector
  // labeled by majority vote over its 5 exact nearest neighbors' labels,
  // ties broken (count desc, label asc) — the engine's pinned twin of the
  // reference's Python `mode`
  q("q_knn_classify",
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |d AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS dv, label
      |  FROM embeddings),
      |sc AS (SELECT qid, nid, label,
      |  list_dot_product(qv, dv)
      |    / sqrt(list_dot_product(qv, qv) * list_dot_product(dv, dv)) AS c
      |  FROM q JOIN d ON qid != nid),
      |r AS (SELECT qid, label,
      |  row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rank FROM sc),
      |v AS (SELECT qid, label, count(*) AS n FROM r WHERE rank <= 5 GROUP BY 1, 2)
      |SELECT qid, label AS predicted_label FROM (
      |  SELECT qid, label,
      |    row_number() OVER (PARTITION BY qid ORDER BY n DESC, label) AS rn FROM v)
      |WHERE rn = 1""") { (s, dir) =>
    import graft.operators.DataIndex
    val emb = load(s, dir, "embeddings")
    DataIndex.classify(
      DataIndex.bruteForce(emb, col("vec_id"), col("embedding"), dim = 64),
      emb, col("vec_id"), col("label"),
      emb.filter(col("vec_id") % 50 === 0), col("vec_id"), col("embedding"),
      k = 5)
  }

  // fuzzy join: even-id docs matched to their most-similar odd-id doc
  q("q_fuzzy_join",
    """WITH l AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |r AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
      |wl AS (SELECT doc_id, string_split(text,' ') AS ws FROM l),
      |wr AS (SELECT doc_id, string_split(text,' ') AS ws FROM r),
      |shl0 AS (SELECT DISTINCT doc_id, ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2] AS s
      |  FROM wl, UNNEST(range(1, len(ws)-1)) AS t(j)),
      |shr0 AS (SELECT DISTINCT doc_id, ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2] AS s
      |  FROM wr, UNNEST(range(1, len(ws)-1)) AS t(j)),
      |shl AS (SELECT doc_id, s FROM shl0
      |  QUALIFY count(*) OVER (PARTITION BY s) <= 20),
      |shr AS (SELECT doc_id, s FROM shr0
      |  QUALIFY count(*) OVER (PARTITION BY s) <= 20),
      |mhl AS (SELECT doc_id, min(md5('0|' || s)) AS h0, min(md5('1|' || s)) AS h1,
      |  min(md5('2|' || s)) AS h2, min(md5('3|' || s)) AS h3,
      |  min(md5('4|' || s)) AS h4, min(md5('5|' || s)) AS h5 FROM shl GROUP BY 1),
      |mhr AS (SELECT doc_id, min(md5('0|' || s)) AS h0, min(md5('1|' || s)) AS h1,
      |  min(md5('2|' || s)) AS h2, min(md5('3|' || s)) AS h3,
      |  min(md5('4|' || s)) AS h4, min(md5('5|' || s)) AS h5 FROM shr GROUP BY 1),
      |bl AS (SELECT doc_id, 0 AS band, md5(h0 || h1) AS bk FROM mhl UNION ALL
      |  SELECT doc_id, 1, md5(h2 || h3) FROM mhl UNION ALL
      |  SELECT doc_id, 2, md5(h4 || h5) FROM mhl),
      |br AS (SELECT doc_id, 0 AS band, md5(h0 || h1) AS bk FROM mhr UNION ALL
      |  SELECT doc_id, 1, md5(h2 || h3) FROM mhr UNION ALL
      |  SELECT doc_id, 2, md5(h4 || h5) FROM mhr),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bl x JOIN br y ON x.band = y.band AND x.bk = y.bk),
      |szl AS (SELECT doc_id, count(*) AS n FROM shl GROUP BY 1),
      |szr AS (SELECT doc_id, count(*) AS n FROM shr GROUP BY 1),
      |i AS (SELECT c.a, c.b, count(*) AS i FROM cand c
      |  JOIN shl sa ON sa.doc_id = c.a
      |  JOIN shr sb ON sb.doc_id = c.b AND sb.s = sa.s GROUP BY 1, 2),
      |p AS (SELECT a, b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
      |  FROM i JOIN szl sa ON sa.doc_id = a JOIN szr sb ON sb.doc_id = b
      |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5)
      |SELECT a, b, round(jaccard, 4) AS jaccard FROM (
      |  SELECT *, row_number() OVER (PARTITION BY a ORDER BY jaccard DESC, b) AS rn
      |  FROM p) WHERE rn = 1""") { (s, dir) =>
    val docs = load(s, dir, "documents")
    Dedup.fuzzyJoin(
        docs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
        n = 3, k = 6, bands = 3, threshold = 0.5, maxDf = 20)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // as-of RIGHT join: all purchases kept; unmatched ones carry null click
  q("q_asof_right",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
      |  WHERE event_type = 'purchase'),
      |i AS (SELECT c.event_id, p.p_id FROM c ASOF JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.p_ts)
      |SELECT event_id, p_id FROM i
      |UNION ALL
      |SELECT NULL, p.p_id FROM p
      |WHERE p.p_id NOT IN (SELECT p_id FROM i)""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    Temporal.asofJoinFull(clicks, purchases, col("ts"), col("p_ts"),
        Seq("user_id"), Temporal.Backward, "right",
        rightIdCols = Seq("p_id"), rightTieBreak = col("p_id"))
      .select(col("event_id"), col("p_id"))
  }

  // interval OUTER join: every click and every view appears at least once
  q("q_interval_outer",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |v AS (SELECT event_id AS v_id, user_id AS v_user, ts AS v_ts FROM events
      |  WHERE event_type = 'view')
      |SELECT c.event_id, v.v_id FROM c LEFT JOIN v
      |  ON v.v_user = c.user_id
      |  AND epoch_us(v.v_ts) BETWEEN epoch_us(c.ts) - 300000000
      |                           AND epoch_us(c.ts) + 300000000
      |UNION ALL
      |SELECT NULL, v.v_id FROM v WHERE NOT EXISTS (
      |  SELECT 1 FROM c WHERE v.v_user = c.user_id
      |  AND epoch_us(v.v_ts) BETWEEN epoch_us(c.ts) - 300000000
      |                           AND epoch_us(c.ts) + 300000000)""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
    Temporal.intervalJoinFull(clicks, views, col("ts"), col("v_ts"),
        -300, 300, keys = Seq("user_id"), how = "outer",
        leftIdCols = Seq("event_id"), rightIdCols = Seq("v_id"))
      .select(col("event_id"), col("v_id"))
  }
}
