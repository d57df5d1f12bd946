package graft

import org.apache.spark.sql.functions._
import graft.core.Table
import graft.operators.Temporal
import graft.SparkEntry.loadEvents

/** Oracle-checked queries for the temporal operator library
  * (reference: stdlib/temporal/ — _window.py, _interval_join.py,
  * _asof_join.py, _window_join.py; ordered ops stdlib/ordered/diff.py and
  * table.py:2157 sort).
  *
  * All event timestamps are µs-exact on both sides (see
  * SparkEntry.loadEvents), so window boundaries computed in µs arithmetic
  * agree bit-for-bit with the DuckDB oracle's epoch_us.
  */
object TemporalQueries extends QueryModule {

  /** DuckDB replay of the b=6 HLL register+raw-estimate pipeline over a
    * (user_id, it) source CTE — shared by q_hll_stream's two batch
    * prefixes (same recipe as q_hll_distinct/q_hll_merge, grouped by
    * user). Produces `est$sfx(user_id, v0, raw)`. */
  private def hllUserRegsSql(src: String, sfx: String): String =
    s"""h$sfx AS (SELECT user_id, md5('hll' || it) AS hx FROM $src),
      |br$sfx AS (SELECT user_id,
      |  CAST('0x' || substr(hx, 1, 4) AS INTEGER) % 64 AS bucket,
      |  substr(hx, 5, 28) AS rest FROM h$sfx),
      |zd$sfx AS (SELECT user_id, bucket,
      |  length(regexp_extract(rest, '^0*', 0)) AS z, rest FROM br$sfx),
      |rh$sfx AS (SELECT user_id, bucket, LEAST(CASE WHEN z = 28 THEN 30
      |    ELSE 4*z + CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1
      |                     WHEN d >= 2 THEN 2 ELSE 3 END + 1 END, 30) AS rho
      |  FROM (SELECT user_id, bucket, z, CASE WHEN z = 28 THEN 0
      |      ELSE CAST('0x' || substr(rest, z + 1, 1) AS INTEGER) END AS d
      |    FROM zd$sfx) s),
      |reg$sfx AS (SELECT user_id, bucket, MAX(rho) AS rho FROM rh$sfx
      |  GROUP BY 1, 2),
      |agg$sfx AS (SELECT user_id, count(*) AS np,
      |  CAST(sum(CAST(power(2, 30 - rho) AS BIGINT)) AS BIGINT) AS zup
      |  FROM reg$sfx GROUP BY 1),
      |est$sfx AS (SELECT user_id, 64 - np AS v0,
      |  (0.709::DOUBLE) * 64.0 * 64.0 * 1073741824.0
      |    / CAST(zup + (64 - np) * 1073741824 AS DOUBLE) AS raw
      |  FROM agg$sfx)""".stripMargin

  private val DAY_US = 86400000000L

  // tumbling window (reference: _window.py:737) — 1-day windows
  q("q_tumbling",
    """SELECT event_type,
      |  make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS window_start,
      |  count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_value
      |FROM events GROUP BY 1, 2""") { (s, dir) =>
    loadEvents(s, dir)
      .withColumn("window_start", Temporal.tumble(col("ts"), 86400))
      .groupBy(col("event_type"), col("window_start"))
      .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("sum_value"))
  }

  // sliding window (reference: _window.py:660) — 2-day windows, 1-day hop:
  // every row lands in exactly 2 windows
  q("q_sliding",
    """SELECT event_type,
      |  make_timestamp(((epoch_us(ts) // 86400000000) - i.i) * 86400000000)
      |    AS window_start,
      |  count(*) AS n
      |FROM events CROSS JOIN (SELECT unnest(range(2)) AS i) i
      |GROUP BY 1, 2""") { (s, dir) =>
    Temporal.assignSliding(loadEvents(s, dir), col("ts"), 172800, 86400)
      .groupBy(col("event_type"), col("window_start"))
      .agg(count(lit(1)).as("n"))
  }

  // session window, 4-hour max gap (reference: _window.py:595)
  q("q_session",
    """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |    OR us - lag(us) OVER w > 14400000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |x AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM m)
      |SELECT user_id, make_timestamp(min(us)) AS session_start,
      |  count(*) AS n_events, round(CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_value
      |FROM x GROUP BY user_id, sess""") { (s, dir) =>
    Temporal.sessionize(loadEvents(s, dir), col("ts"), 4 * 3600,
        Seq(col("user_id")), tieBreak = Seq(col("event_id")))
      .groupBy(col("user_id"), col("session_start"))
      .agg(count(lit(1)).as("n_events"), r4(dsum(col("value"))).as("sum_value"))
  }

  // sessionized conversion funnel: per user, how many sessions saw a
  // click and how many of those converted to a purchase — sessionize +
  // conditional aggregation composition (the product-analytics shape)
  q("q_session_funnel",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |    OR us - lag(us) OVER w > 14400000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |x AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM m),
      |s AS (SELECT user_id, sess,
      |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_buy
      |  FROM x GROUP BY user_id, sess)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(sum(has_click) AS BIGINT) AS n_click_sessions,
      |  CAST(sum(has_click * has_buy) AS BIGINT) AS n_converted
      |FROM s GROUP BY user_id""") { (s, dir) =>
    Temporal.sessionize(loadEvents(s, dir), col("ts"), 4 * 3600,
        Seq(col("user_id")), tieBreak = Seq(col("event_id")))
      .groupBy(col("user_id"), col("session_start"))
      .agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("has_click"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_buy"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("has_click")).cast("long").as("n_click_sessions"),
        sum(col("has_click") * col("has_buy")).cast("long").as("n_converted"))
  }

  // interval join (reference: _interval_join.py:577) — views within ±5 min
  // of each click, same user, left semantics (clicks w/o views count 0)
  q("q_interval_join",
    """SELECT c.event_id, count(v.event_id) AS n_views
      |FROM events c LEFT JOIN events v
      |  ON v.event_type = 'view' AND v.user_id = c.user_id
      |  AND epoch_us(v.ts) BETWEEN epoch_us(c.ts) - 300000000
      |                         AND epoch_us(c.ts) + 300000000
      |WHERE c.event_type = 'click'
      |GROUP BY 1""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
    Temporal.intervalJoin(clicks, views, col("ts"), col("v_ts"), -300, 300,
        keys = Seq("user_id"), how = "left", leftIdCols = Seq("event_id"))
      .groupBy(col("event_id"))
      .agg(count(col("v_id")).as("n_views"))
  }

  // as-of join BACKWARD (reference: _asof_join.py:479) — latest purchase
  // at/before each click, same user; DuckDB ASOF JOIN is the oracle
  q("q_asof_backward",
    """SELECT c.event_id, p.p_id, round(p.p_value, 4) AS p_value
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT event_id AS p_id, user_id, ts AS p_ts,
      |    value AS p_value FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.p_ts""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    Temporal.asofJoin(clicks, purchases, col("ts"), col("p_ts"),
        Seq("user_id"), Temporal.Backward, "left", rightTieBreak = col("p_id"))
      .select(col("event_id"), col("p_id"), r4(col("p_value")).as("p_value"))
  }

  // as-of join FORWARD — earliest signup at/after each error, same user
  q("q_asof_forward",
    """SELECT c.event_id, p.s_id
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') c
      |ASOF LEFT JOIN (SELECT event_id AS s_id, user_id, ts AS s_ts
      |    FROM events WHERE event_type = 'signup') p
      |  ON c.user_id = p.user_id AND c.ts <= p.s_ts""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id"), col("ts").as("s_ts"))
    Temporal.asofJoin(errors, signups, col("ts"), col("s_ts"),
        Seq("user_id"), Temporal.Forward, "left", rightTieBreak = col("s_id"))
      .select(col("event_id"), col("s_id"))
  }

  // as-of join NEAREST — closest purchase in time per click (tie → earlier)
  q("q_asof_nearest",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
      |  WHERE event_type = 'purchase'),
      |b AS (SELECT c.event_id, p.p_id AS b_id, p.p_ts AS b_ts
      |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.p_ts),
      |f AS (SELECT c.event_id, p.p_id AS f_id, p.p_ts AS f_ts
      |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.p_ts)
      |SELECT c.event_id,
      |  CASE WHEN b.b_id IS NULL THEN f.f_id
      |       WHEN f.f_id IS NULL THEN b.b_id
      |       WHEN epoch_us(c.ts) - epoch_us(b.b_ts)
      |         <= epoch_us(f.f_ts) - epoch_us(c.ts) THEN b.b_id
      |       ELSE f.f_id END AS near_id
      |FROM c JOIN b USING (event_id) JOIN f USING (event_id)""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("near_id"), col("user_id"), col("ts").as("p_ts"))
    Temporal.asofJoin(clicks, purchases, col("ts"), col("p_ts"),
        Seq("user_id"), Temporal.Nearest, "left", rightTieBreak = col("near_id"))
      .select(col("event_id"), col("near_id"))
  }

  // window join (reference: _window_join.py:156) — clicks × errors in the
  // same 1-day tumbling window per user
  q("q_window_join",
    """SELECT c.user_id,
      |  make_timestamp((epoch_us(c.ts) // 86400000000) * 86400000000) AS window_start,
      |  count(*) AS n_pairs
      |FROM events c JOIN events e
      |  ON e.user_id = c.user_id AND e.event_type = 'error'
      |  AND epoch_us(e.ts) // 86400000000 = epoch_us(c.ts) // 86400000000
      |WHERE c.event_type = 'click'
      |GROUP BY 1, 2""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id"), col("ts").as("e_ts"))
    Temporal.windowJoinTumbling(clicks, errors, col("ts"), col("e_ts"),
        86400, Seq("user_id"))
      .groupBy(col("user_id"), col("window_start"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  // sliding window join (reference: _window_join.py:156) — clicks × errors
  // coinciding in any 2-day window hopping daily (each row in 2 windows)
  q("q_window_join_sliding",
    """WITH c AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events WHERE event_type = 'click'),
      |e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events WHERE event_type = 'error'),
      |cw AS (SELECT user_id, d - i.i AS w FROM c CROSS JOIN (SELECT unnest(range(2)) AS i) i),
      |ew AS (SELECT user_id, d - i.i AS w FROM e CROSS JOIN (SELECT unnest(range(2)) AS i) i)
      |SELECT cw.user_id, make_timestamp(cw.w * 86400000000) AS window_start,
      |  count(*) AS n_pairs
      |FROM cw JOIN ew ON ew.user_id = cw.user_id AND ew.w = cw.w
      |GROUP BY 1, 2""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id"), col("ts").as("e_ts"))
    Temporal.windowJoinSliding(clicks, errors, col("ts"), col("e_ts"),
        172800, 86400, Seq("user_id"))
      .groupBy(col("user_id"), col("window_start"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  // sliding window join, OUTER mode (_window_join.py:156 per-window
  // unmatched semantics): every (row, covering-window) assignment on
  // EITHER side surfaces at least once — a click in a window with no
  // errors carries a null e_id, an error in a window with no clicks a
  // null event_id. The join key includes the window, so "unmatched" is
  // per window assignment, not per row.
  q("q_window_join_sliding_outer",
    """WITH c AS (SELECT event_id, user_id, epoch_us(ts) // 86400000000 AS d
      |  FROM events WHERE event_type = 'click'),
      |e AS (SELECT event_id AS e_id, user_id, epoch_us(ts) // 86400000000 AS d
      |  FROM events WHERE event_type = 'error'),
      |cw AS (SELECT event_id, user_id, d - i.i AS w FROM c
      |  CROSS JOIN (SELECT unnest(range(2)) AS i) i),
      |ew AS (SELECT e_id, user_id, d - i.i AS w FROM e
      |  CROSS JOIN (SELECT unnest(range(2)) AS i) i)
      |SELECT coalesce(cw.user_id, ew.user_id) AS user_id,
      |  make_timestamp(coalesce(cw.w, ew.w) * 86400000000) AS window_start,
      |  cw.event_id, ew.e_id
      |FROM cw FULL OUTER JOIN ew
      |  ON ew.user_id = cw.user_id AND ew.w = cw.w""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id"), col("ts").as("e_ts"))
    Temporal.windowJoinSliding(clicks, errors, col("ts"), col("e_ts"),
        172800, 86400, Seq("user_id"), how = "outer")
      .select(col("user_id"), col("window_start"), col("event_id"), col("e_id"))
  }

  // session window join (reference: _window_join.py:156) — sessions form
  // over the UNION of both sides' times (4h gap), then clicks × errors
  // within each shared session
  q("q_window_join_session",
    """WITH c AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
      |er AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error'),
      |m AS (SELECT DISTINCT user_id, us FROM (SELECT * FROM c UNION ALL SELECT * FROM er)),
      |s AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |    OR us - lag(us) OVER w > 14400000000 THEN 1 ELSE 0 END AS is_new
      |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |x AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us
      |    ROWS UNBOUNDED PRECEDING) AS sess FROM s),
      |g AS (SELECT user_id, us, make_timestamp(min(us) OVER (PARTITION BY user_id, sess))
      |    AS session_start FROM x)
      |SELECT cg.user_id, cg.session_start, count(*) AS n_pairs
      |FROM (SELECT c.user_id, g.session_start FROM c JOIN g ON g.user_id = c.user_id AND g.us = c.us) cg
      |JOIN (SELECT er.user_id, g.session_start FROM er JOIN g ON g.user_id = er.user_id AND g.us = er.us) eg
      |  ON eg.user_id = cg.user_id AND eg.session_start = cg.session_start
      |GROUP BY 1, 2""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id"), col("ts").as("e_ts"))
    Temporal.windowJoinSession(clicks, errors, col("ts"), col("e_ts"),
        4 * 3600, Seq("user_id"))
      .groupBy(col("user_id"), col("session_start"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  // session window join, OUTER mode: sessions still form over the UNION
  // of both sides' times, and a session whose one side is empty
  // surfaces its other side's rows with nulls — per-session unmatched
  // semantics (_window_join.py:156).
  q("q_window_join_session_outer",
    """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      |  WHERE event_type = 'click'),
      |er AS (SELECT event_id AS e_id, user_id, epoch_us(ts) AS us FROM events
      |  WHERE event_type = 'error'),
      |m AS (SELECT DISTINCT user_id, us FROM (
      |  SELECT user_id, us FROM c UNION ALL SELECT user_id, us FROM er)),
      |s AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |    OR us - lag(us) OVER w > 14400000000 THEN 1 ELSE 0 END AS is_new
      |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |x AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us
      |    ROWS UNBOUNDED PRECEDING) AS sess FROM s),
      |g AS (SELECT user_id, us, make_timestamp(min(us) OVER (PARTITION BY user_id, sess))
      |    AS session_start FROM x),
      |cg AS (SELECT c.user_id, g.session_start, c.event_id FROM c
      |  JOIN g ON g.user_id = c.user_id AND g.us = c.us),
      |eg AS (SELECT er.user_id, g.session_start, er.e_id FROM er
      |  JOIN g ON g.user_id = er.user_id AND g.us = er.us)
      |SELECT coalesce(cg.user_id, eg.user_id) AS user_id,
      |  coalesce(cg.session_start, eg.session_start) AS session_start,
      |  cg.event_id, eg.e_id
      |FROM cg FULL OUTER JOIN eg
      |  ON eg.user_id = cg.user_id AND eg.session_start = cg.session_start""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id"), col("ts").as("e_ts"))
    Temporal.windowJoinSession(clicks, errors, col("ts"), col("e_ts"),
        4 * 3600, Seq("user_id"), how = "outer")
      .select(col("user_id"), col("session_start"), col("event_id"), col("e_id"))
  }

  // intervals_over (reference: _window.py:795) — per signup, aggregate the
  // user's events in the following 7 days (self at Δ=0 included)
  q("q_intervals_over",
    """SELECT s.event_id, count(*) AS n, round(CAST(sum(CAST(e.value AS DECIMAL(24,6))) AS DOUBLE) / count(e.value) + 1e-9, 4) AS avg_value
      |FROM events s JOIN events e
      |  ON e.user_id = s.user_id
      |  AND epoch_us(e.ts) BETWEEN epoch_us(s.ts)
      |                         AND epoch_us(s.ts) + 604800000000
      |WHERE s.event_type = 'signup'
      |GROUP BY 1""") { (s, dir) =>
    val ev = loadEvents(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    val data = loadEvents(s, dir)
      .select(col("event_id").as("e_id"), col("user_id"),
        col("ts").as("e_ts"), col("value").as("e_value"))
    Temporal.intervalsOver(signups, data, col("ts"), col("e_ts"),
        0, 604800, keys = Seq("user_id"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n"), r4(davg(col("e_value"))).as("avg_value"))
  }

  // ordered diff (reference: stdlib/ordered/diff.py:10)
  q("q_diff",
    """SELECT event_id, round(value - lag(value) OVER
      |  (PARTITION BY user_id ORDER BY ts, event_id), 4) AS d
      |FROM events""") { (s, dir) =>
    Table.fromDF(loadEvents(s, dir), Seq("event_id"))
      .diff(Seq(col("ts"), col("event_id")), Some(col("user_id")), "value")
      .select("d" -> r4(col("diff_value")))
      .df.select("event_id", "d")
  }

  // sort → prev/next linked list (reference: table.py:2157, prev_next.rs)
  q("q_sort_linked",
    """SELECT event_id,
      |  lag(event_id) OVER w AS prev_id, lead(event_id) OVER w AS next_id
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""") { (s, dir) =>
    Table.fromDF(loadEvents(s, dir), Seq("event_id"))
      .sortLinked(Seq(col("ts"), col("event_id")), col("user_id"))
      .select("prev_id" -> col("prev").getField("event_id"),
        "next_id" -> col("next").getField("event_id"))
      .df.select("event_id", "prev_id", "next_id")
  }

  // interpolate (reference: stdlib/statistical/_interpolate.py:33) —
  // null out error-event values, linearly interpolate per user timeline
  // (instance = user_id: one window partition per key, scale-safe)
  q("q_interpolate",
    """WITH e AS (SELECT event_id, user_id, epoch(ts) AS t,
      |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v FROM events),
      |w AS (SELECT event_id, t, v,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |  last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY t, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
      |  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |  first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY t, event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      |FROM e)
      |SELECT event_id, round(CASE WHEN v IS NOT NULL THEN v
      |  WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv
      |  ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END, 4) AS value
      |FROM w""") { (s, dir) =>
    val ev = loadEvents(s, dir)
      .withColumn("value", when(col("event_type") =!= "error", col("value")))
    Table.fromDF(ev, Seq("event_id"))
      .interpolate(col("ts"), Seq(col("event_id")), Some(col("user_id")), "value")
      .select("value" -> r4(col("value")))
      .df.select("event_id", "value")
  }

  // acceptor-based deduplicate, batch twin (reference: table.py:1064):
  // acceptor "replace when value grows" makes the surviving value the
  // per-user maximum — trivially stated by the oracle while the
  // implementation runs the general secondary-sort acceptor scan
  q("q_dedup_acceptor",
    """SELECT user_id, round(max(value), 4) AS value
      |FROM events GROUP BY user_id""") { (s, dir) =>
    import org.apache.spark.sql.Row
    graft.streaming.Streaming.deduplicateBatch(
        loadEvents(s, dir).select(col("user_id"), col("ts"), col("event_id"),
          col("value")),
        Seq("user_id"), Seq(col("ts"), col("event_id")),
        (n: Row, p: Row) => n.getDouble(3) > p.getDouble(3))
      .select(col("user_id"), round(col("value"), 4).as("value"))
  }

  // STREAMING behavior replayed deterministically against a batch oracle
  // (reference: temporal_behavior.py:29 common_behavior cutoff / engine
  // `forget` time_column.rs:556) — the first oracle-checked row for the
  // behavior family, which is otherwise ScalaTest-only. Three timed
  // MemoryStream batches: (A) every on-time row (event_id % 10 != 0),
  // establishing watermark = ms-floor(max ts over A) − 25h; (B) the
  // held-back rows, of which those in 1-day windows closed before the
  // watermark are DROPPED by the cutoff; (C) one far-future sentinel that
  // closes every real window so append mode emits each exactly once. The
  // oracle recomputes the same watermark arithmetic in µs and aggregates
  // only the surviving rows.
  q("q_behavior_cutoff",
    """WITH ev AS (SELECT event_id, ts, event_type, value FROM events),
      |a AS (SELECT * FROM ev WHERE event_id % 10 <> 0),
      |wm AS (SELECT ((max(epoch_us(ts)) // 1000) - 90000000) * 1000 AS w FROM a),
      |kept AS (
      |  SELECT * FROM a
      |  UNION ALL
      |  SELECT e.* FROM ev e, wm
      |  WHERE e.event_id % 10 = 0
      |    AND ((epoch_us(e.ts) // 86400000000) + 1) * 86400000000 > wm.w)
      |SELECT event_type,
      |  make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS window_start,
      |  count(*) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_value
      |FROM kept GROUP BY 1, 2""") { (s, dir) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = loadEvents(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, String, Double)].collect()
    val (held, ontime) = rows.partition(_._1 % 10 == 0)
    val sentinel = (-1L,
      new java.sql.Timestamp(rows.map(_._2.getTime).max + 30L * 86400 * 1000),
      "zz_sentinel", 0.0)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val behaved = graft.streaming.Streaming.withBehavior(
      in.toDF().toDF("event_id", "ts", "event_type", "value"), "ts",
      graft.streaming.Streaming.Behavior(cutoff = Some("25 hours"),
        keepResults = false))
    val agg = behaved
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("sum_value"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("n"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName("behavior_cutoff_out")
      .outputMode(graft.streaming.Streaming.outputMode(
        graft.streaming.Streaming.Behavior(keepResults = false))).start()
    try {
      in.addData(ontime.toSeq); q.processAllAvailable()
      in.addData(held.toSeq); q.processAllAvailable()
      in.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()
    // the sentinel's own window never closes (nothing advances the
    // watermark past it) — the filter is belt-and-braces
    s.table("behavior_cutoff_out").filter(col("event_type") =!= "zz_sentinel")
  }

  // keep_results=true twin of q_behavior_cutoff (reference:
  // temporal_behavior.py:29 keep_results / engine `freeze`
  // time_column.rs:631 ≈ update output mode): same watermark drop, but
  // every window update is EMITTED as it happens instead of once at
  // close. The memory sink therefore holds each window's whole update
  // history; the final state is recovered by max-collapsing on n (a
  // window's count strictly grows with each update, so max(struct(n,
  // sum)) is its last emission) and must equal the same kept-rows
  // aggregate the append-mode run converges to — update needs no
  // sentinel: open windows emit too.
  q("q_behavior_keep",
    """WITH ev AS (SELECT event_id, ts, event_type, value FROM events),
      |a AS (SELECT * FROM ev WHERE event_id % 10 <> 0),
      |wm AS (SELECT ((max(epoch_us(ts)) // 1000) - 90000000) * 1000 AS w FROM a),
      |kept AS (
      |  SELECT * FROM a
      |  UNION ALL
      |  SELECT e.* FROM ev e, wm
      |  WHERE e.event_id % 10 = 0
      |    AND ((epoch_us(e.ts) // 86400000000) + 1) * 86400000000 > wm.w)
      |SELECT event_type,
      |  make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS window_start,
      |  count(*) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_value
      |FROM kept GROUP BY 1, 2""") { (s, dir) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = loadEvents(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, String, Double)].collect()
    val (held, ontime) = rows.partition(_._1 % 10 == 0)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val behavior = graft.streaming.Streaming.Behavior(
      cutoff = Some("25 hours"), keepResults = true)
    val agg = graft.streaming.Streaming.withBehavior(
        in.toDF().toDF("event_id", "ts", "event_type", "value"), "ts", behavior)
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("sum_value"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("n"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName("behavior_keep_out")
      .outputMode(graft.streaming.Streaming.outputMode(behavior)).start()
    try {
      in.addData(ontime.toSeq); q.processAllAvailable()
      in.addData(held.toSeq); q.processAllAvailable()
    } finally q.stop()
    s.table("behavior_keep_out")
      .groupBy(col("event_type"), col("window_start"))
      .agg(max(struct(col("n"), col("sum_value"))).as("_last"))
      .select(col("event_type"), col("window_start"),
        col("_last.n").as("n"), col("_last.sum_value").as("sum_value"))
  }

  // asof_now_join driven to an ORACLE (reference: _asof_now_join.py:176;
  // previously spec-only): each stream row joins the static side's state
  // AT ARRIVAL, later updates don't retract. The static side lives in
  // embedded Derby because a JDBC relation re-executes its scan every
  // micro-batch (file-based static sides pin their listing at plan
  // time): odd orders join V1 (customer balances as loaded), the table
  // is then overwritten with V2 (+100), and even orders join V2. The
  // oracle states the per-batch outcome directly.
  q("q_asof_now",
    """SELECT o_orderkey,
      |  round(c_acctbal + CASE WHEN o_orderkey % 2 = 0 THEN 100.0 ELSE 0.0 END,
      |    4) AS bal
      |FROM orders JOIN customer ON o_custkey = c_custkey""") { (s, dir) =>
    import s.implicits._
    import graft.SparkEntry.load
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")
    val db = java.nio.file.Files.createTempDirectory("graft_asofnow").toString + "/db"
    val cust = load(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    graft.sources.io.writeJdbc(cust.coalesce(1),
      s"jdbc:derby:$db;create=true", "cust_state")
    val o = load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .as[(Long, Long)].collect()
    val (evens, odds) = o.partition(_._1 % 2 == 0)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val static = graft.sources.io.jdbc(s, s"jdbc:derby:$db", "cust_state",
      key = Seq("c_custkey")).df.withColumnRenamed("c_custkey", "o_custkey")
    val joined = graft.streaming.Streaming.asofNowJoin(
      in.toDF().toDF("o_orderkey", "o_custkey"), static, Seq("o_custkey"))
    val q = joined.select(col("o_orderkey"), col("c_acctbal").as("bal"))
      .writeStream.format("memory").queryName("asof_now_out")
      .outputMode("append").start()
    try {
      in.addData(odds.toSeq); q.processAllAvailable()
      graft.sources.io.writeJdbc(
        cust.withColumn("c_acctbal", col("c_acctbal") + 100.0).coalesce(1),
        s"jdbc:derby:$db", "cust_state") // overwrite → V2
      in.addData(evens.toSeq); q.processAllAvailable()
    } finally q.stop()
    s.table("asof_now_out").select(col("o_orderkey"), r4(col("bal")).as("bal"))
  }

  // stream-stream interval join driven to an ORACLE (reference:
  // _interval_join.py in streaming mode; previously StreamingSpec-only):
  // clicks and views replayed as two batches per side through
  // intervalJoinStream — the second batch must still match rows buffered
  // from the first (cross-batch state), and a 10-year watermark delay
  // keeps every row in state so the inner-join emission is exactly the
  // batch interval join DuckDB computes.
  q("q_interval_stream",
    """SELECT c.event_id, v.event_id AS v_id
      |FROM events c JOIN events v
      |  ON v.event_type = 'view' AND v.user_id = c.user_id
      |  AND epoch_us(v.ts) BETWEEN epoch_us(c.ts) - 300000000
      |                         AND epoch_us(c.ts) + 300000000
      |WHERE c.event_type = 'click'""") { (s, dir) =>
    import s.implicits._
    val ev = loadEvents(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
    val clicks = ev.filter(_._4 == "click").map(t => (t._1, t._2, t._3))
    val views = ev.filter(_._4 == "view").map(t => (t._1, t._2, t._3))
    // state-store partition count is locked in at query start; 32 stores
    // × 2 sides × 2 batches is pure commit overhead for a replay this
    // size. Pin it low in an ISOLATED child session (own SQLConf, shared
    // SparkContext) — mutating the shared session's conf would leak into
    // queries Verify plans concurrently on its thread pool.
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val lIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = graft.streaming.Streaming.intervalJoinStream(
      lIn.toDF().toDF("event_id", "user_id", "ts"),
      rIn.toDF().toDF("v_id", "user_id", "v_ts"),
      Seq("user_id"), "ts", "v_ts", "-300 seconds", "300 seconds",
      watermarkDelay = "3650 days", how = "inner")
    val q = joined.select(col("event_id"), col("v_id"))
      .writeStream.format("memory").queryName("interval_stream_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = clicks.splitAt(clicks.length / 2)
      val (v1, v2) = views.splitAt(views.length / 2)
      lIn.addData(c1.toSeq); rIn.addData(v1.toSeq); q.processAllAvailable()
      lIn.addData(c2.toSeq); rIn.addData(v2.toSeq); q.processAllAvailable()
    } finally q.stop()
    s2.table("interval_stream_out")
  }

  // inactivity_detection driven to an ORACLE (reference:
  // time_utils.py:52; previously spec-only): every user key goes silent
  // by end-of-input, so each emits exactly once with its last-seen time.
  // Two far-future sentinels advance the event-time watermark in stages
  // (old keys time out after the first, the rest after the second) —
  // Exponential moving average — the inherently sequential time-series
  // reduction no commutative aggregate expresses: secondary sort (one
  // repartition + in-partition sort + linear scan, unbounded group
  // size), fold replayed bit-identically by DuckDB's list_reduce over
  // the same order
  q("q_ema",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |  round(list_reduce(list(value ORDER BY event_id),
      |    (acc, x) -> 0.2::DOUBLE * x + (1 - 0.2::DOUBLE) * acc) + 1e-9, 4)
      |    AS ema
      |FROM events WHERE value IS NOT NULL GROUP BY user_id""") { (s, dir) =>
    graft.operators.Stats.ema(loadEvents(s, dir), Seq("user_id"),
        "event_id", "value", alpha = 0.2)
      .select(col("user_id"), col("n"),
        round(col("ema") + lit(1e-9), 4).as("ema"))
  }

  // Streaming EMA: the sequential fold continued across micro-batches
  // with (n, ema) as the whole keyed state, emitting per touched batch.
  // The oracle replays both batch prefixes as DuckDB list_reduce folds —
  // the stream's per-row arithmetic is the identical IEEE expression.
  q("q_ema_stream",
    """WITH mid AS (SELECT event_id AS m FROM events ORDER BY event_id
      |  OFFSET (SELECT count(*) // 2 FROM events) LIMIT 1),
      |pts AS (SELECT user_id, event_id, value,
      |  event_id < (SELECT m FROM mid) AS is1
      |  FROM events WHERE value IS NOT NULL),
      |e1 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |  list_reduce(list(value ORDER BY event_id),
      |    (acc, x) -> 0.2::DOUBLE * x + (1 - 0.2::DOUBLE) * acc) AS ema
      |  FROM pts WHERE is1 GROUP BY user_id),
      |eA AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |  list_reduce(list(value ORDER BY event_id),
      |    (acc, x) -> 0.2::DOUBLE * x + (1 - 0.2::DOUBLE) * acc) AS ema
      |  FROM pts WHERE user_id IN
      |    (SELECT DISTINCT user_id FROM pts WHERE NOT is1)
      |  GROUP BY user_id)
      |SELECT user_id, n, round(ema + 1e-9, 4) AS ema FROM e1
      |UNION ALL
      |SELECT user_id, n, round(ema + 1e-9, 4) AS ema FROM eA""") { (s, dir) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // mid is derived over ALL events (the oracle's count(*)//2 offset
    // counts NULL-value rows too); the feed then carries only non-null
    // values — a NULL would crash the (Long, Long, Double) encoder, and
    // both emaStream and the oracle ignore such rows anyway
    val all = loadEvents(s, dir)
      .select(col("user_id"), col("event_id"), col("value")).collect()
    val mid = all.map(_.getLong(1)).sorted.apply(all.length / 2)
    val rows = all.filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._2)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val events = in.toDF().toDF("user_id", "event_id", "value")
    val out = graft.streaming.Streaming.emaStream(events,
      col("user_id"), col("event_id"), col("value"), alpha = 0.2)
    val q = out.writeStream.format("memory").queryName("ema_stream_out")
      .outputMode("append").start()
    try {
      in.addData(rows.filter(_._2 < mid).toSeq); q.processAllAvailable()
      in.addData(rows.filter(_._2 >= mid).toSeq); q.processAllAvailable()
    } finally q.stop()
    s.table("ema_stream_out").select(col("k").as("user_id"), col("n"),
      round(col("ema") + lit(1e-9), 4).as("ema"))
  }

  // Running z-score anomaly detection: each event scored against the
  // mean/stddev of its key's PRIOR events only (leakage-free online
  // shape). Running Σ/Σ² in decimal (exact, order-free), moment formula
  // in double on bit-identical operands — the rvarSamp determinism
  // recipe applied to a window frame.
  q("q_anomaly",
    """WITH w AS (SELECT event_id, user_id, value,
      |  count(value) OVER win AS n,
      |  CAST(sum(CAST(value AS DECIMAL(28,8))) OVER win AS DOUBLE) AS sx,
      |  CAST(sum(CAST(value * value AS DECIMAL(28,8))) OVER win AS DOUBLE) AS sxx
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, CAST(coalesce(n, 0) AS BIGINT) AS n_prior,
      |  round(CASE WHEN n >= 20 AND (n * sxx - sx * sx) / (n * (n - 1)) > 0
      |    THEN (value - sx / n) / sqrt((n * sxx - sx * sx) / (n * (n - 1)))
      |    ELSE NULL END + 1e-9, 4) AS z
      |FROM w""") { (s, dir) =>
    graft.operators.Stats.runningZScore(loadEvents(s, dir),
        col("user_id"), col("event_id"), col("value"), minPrior = 20)
      .select(col("event_id"), col("user_id"), col("n_prior"),
        round(col("z") + lit(1e-9), 4).as("z"))
  }

  // The STREAMING twin — per-key (n, Σ, Σ²) as flatMapGroupsWithState
  // state, scores computed before the state update. Replayed in two
  // micro-batches split at the order midpoint (in-order arrival), the
  // emitted scores must be bit-identical to the batch window above —
  // the exact-decimal state is what makes stream ≡ batch.
  q("q_anomaly_stream",
    """WITH w AS (SELECT event_id, user_id, value,
      |  count(value) OVER win AS n,
      |  CAST(sum(CAST(value AS DECIMAL(28,8))) OVER win AS DOUBLE) AS sx,
      |  CAST(sum(CAST(value * value AS DECIMAL(28,8))) OVER win AS DOUBLE) AS sxx
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, CAST(coalesce(n, 0) AS BIGINT) AS n_prior,
      |  round(CASE WHEN n >= 20 AND (n * sxx - sx * sx) / (n * (n - 1)) > 0
      |    THEN (value - sx / n) / sqrt((n * sxx - sx * sx) / (n * (n - 1)))
      |    ELSE NULL END + 1e-9, 4) AS z
      |FROM w""") { (s, dir) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = loadEvents(s, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    val mid = rows(rows.length / 2)._2
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val events = in.toDF().toDF("user_id", "event_id", "value")
    val out = graft.streaming.Streaming.anomalyStream(events,
      col("user_id"), col("event_id"), col("value"), minPrior = 20)
    val q = out.writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    try {
      in.addData(rows.filter(_._2 < mid).toSeq); q.processAllAvailable()
      in.addData(rows.filter(_._2 >= mid).toSeq); q.processAllAvailable()
    } finally q.stop()
    s.table("anomaly_out")
      .select(col("o").as("event_id"), col("k").as("user_id"),
        col("n_prior"), round(col("z") + lit(1e-9), 4).as("z"))
  }

  // Streaming HLL: a running distinct-count estimate per user with
  // fixed-size keyed state (the m-byte register array), emitting
  // (user, n_seen, estimate) per touched micro-batch. The oracle
  // replays BOTH batch prefixes with the full md5 register arithmetic —
  // the stream's state fold must land on the identical sketch.
  q("q_hll_stream",
    ("""WITH mid AS (SELECT event_id AS m FROM events ORDER BY event_id
      |  OFFSET (SELECT count(*) // 2 FROM events) LIMIT 1),
      |pts AS (SELECT user_id, event_id, CAST(event_id % 50 AS VARCHAR) AS it,
      |  event_id < (SELECT m FROM mid) AS is1 FROM events),
      |p1 AS (SELECT * FROM pts WHERE is1),
      |pA AS (SELECT * FROM pts WHERE user_id IN
      |  (SELECT DISTINCT user_id FROM pts WHERE NOT is1)),
      |REGS1,
      |REGSA,
      |n1 AS (SELECT user_id, count(*) AS n FROM p1 GROUP BY 1),
      |nA AS (SELECT user_id, count(*) AS n FROM pA GROUP BY 1)
      |SELECT e.user_id, n1.n AS n_seen,
      |  round(CASE WHEN raw <= 160.0 AND v0 > 0
      |    THEN 64.0 * ln(64.0 / CAST(v0 AS DOUBLE)) ELSE raw END
      |    + 1e-9, 4) AS estimate
      |FROM est1 e JOIN n1 ON n1.user_id = e.user_id
      |UNION ALL
      |SELECT e.user_id, nA.n AS n_seen,
      |  round(CASE WHEN raw <= 160.0 AND v0 > 0
      |    THEN 64.0 * ln(64.0 / CAST(v0 AS DOUBLE)) ELSE raw END
      |    + 1e-9, 4) AS estimate
      |FROM estA e JOIN nA ON nA.user_id = e.user_id""")
      .replace("REGS1", hllUserRegsSql("p1", "1"))
      .replace("REGSA", hllUserRegsSql("pA", "A"))) { (s, dir) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = loadEvents(s, dir).select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect().sortBy(_._2)
    val mid = rows(rows.length / 2)._2
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val events = in.toDF().toDF("user_id", "event_id")
    val out = graft.streaming.Streaming.hllStream(events,
      col("user_id"), col("event_id") % 50, b = 6)
    val q = out.writeStream.format("memory").queryName("hll_stream_out")
      .outputMode("append").start()
    try {
      in.addData(rows.filter(_._2 < mid).toSeq); q.processAllAvailable()
      in.addData(rows.filter(_._2 >= mid).toSeq); q.processAllAvailable()
    } finally q.stop()
    s.table("hll_stream_out").select(col("k").as("user_id"), col("n_seen"),
      round(col("estimate") + lit(1e-9), 4).as("estimate"))
  }

  // WHICH batch fires a key varies with watermark arithmetic, but the
  // emitted (key, last_seen_ms) set is invariant, which is what the
  // oracle pins: per-user max event time, ms-floored.
  q("q_inactivity",
    """SELECT CAST(user_id AS VARCHAR) AS k,
      |  max(epoch_us(ts)) // 1000 AS last_seen FROM events GROUP BY user_id""") { (s, dir) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = loadEvents(s, dir)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect()
    val maxMs = rows.map(_._2.getTime).max
    def sentinel(days: Long) =
      (-1L, new java.sql.Timestamp(maxMs + days * 86400 * 1000))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val watermarked = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 second")
    val out = graft.streaming.Streaming.inactivityDetection(
      watermarked, "user_id", "ts", "30 days")
    val q = out.toDF("k", "last_seen").writeStream.format("memory")
      .queryName("inactivity_out").outputMode("update").start()
    try {
      in.addData(rows.toSeq); q.processAllAvailable()
      in.addData(Seq(sentinel(45))); q.processAllAvailable()
      in.addData(Seq(sentinel(200))); q.processAllAvailable()
    } finally q.stop()
    s.table("inactivity_out").filter(col("k") =!= "-1")
  }

  // deduplicate — keep latest row per instance (reference: table.py:1064)
  q("q_dedup_latest",
    """SELECT user_id, event_id, round(value, 4) AS value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1""") { (s, dir) =>
    Table.fromDF(loadEvents(s, dir), Seq("event_id"))
      .deduplicateLatest(struct(col("ts"), col("event_id")), Seq("user_id"))
      .select("user_id" -> col("user_id"), "value" -> r4(col("value")))
      .df.select("user_id", "event_id", "value")
  }
}
