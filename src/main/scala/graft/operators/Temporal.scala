package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal operator library (reference: stdlib/temporal/_window.py,
  * _interval_join.py, _asof_join.py, _window_join.py).
  *
  * Scale notes (the part that matters at 100 TB):
  *  - interval/intervals_over joins are re-expressed as EQUI-joins on a
  *    computed time bucket (bucket width = window width), so Catalyst
  *    plans a shuffled/broadcast hash join instead of a
  *    BroadcastNestedLoopJoin. Each left row lands in ≤2 buckets
  *    (reference uses the same trick: _interval_join.py:337-360).
  *  - asof join is the union+ordered-window pattern: one shuffle on the
  *    instance keys, one sort within partitions, no join at all.
  *  - window assignment (tumbling/sliding) is a row-local computation;
  *    sliding explodes to duration/hop rows exactly like the reference's
  *    assign_windows (_window.py:297-327).
  */
object Temporal {

  sealed trait Direction
  case object Backward extends Direction // latest right with rt <= lt
  case object Forward extends Direction // earliest right with rt >= lt
  case object Nearest extends Direction // closer of the two; tie -> backward

  // -----------------------------------------------------------------
  // Window assignment (reference: _window.py tumbling :737 sliding :660)
  // -----------------------------------------------------------------

  /** Tumbling window start for `t` (µs precision), origin-aligned. */
  def tumble(t: Column, durationSec: Long, originEpochSec: Long = 0L): Column = {
    val us = unix_micros(t)
    val d = durationSec * 1000000L
    val o = originEpochSec * 1000000L
    timestamp_micros(((us - o) - pmod(us - o, lit(d))) + o)
  }

  /** Sliding-window starts covering `t` — array of window starts; a row
    * is assigned to every window [s, s+duration) with s ≡ origin (mod
    * hop). When hop > duration some rows get zero windows (reference
    * filters those, _window.py:322-327) — sequence() is empty then. */
  def slideStarts(t: Column, durationSec: Long, hopSec: Long,
      originEpochSec: Long = 0L): Column = {
    val us = unix_micros(t)
    val d = durationSec * 1000000L
    val h = hopSec * 1000000L
    val o = originEpochSec * 1000000L
    // last hop-aligned start <= t, then walk back while still covering t
    val lastStart = (us - o) - pmod(us - o, lit(h)) + o
    filter(
      transform(sequence(lit(0L), lit((d - 1) / h)),
        i => lastStart - i * h),
      s => us >= s && us < s + d)
  }

  /** Explode rows into (windowStart, windowEnd) per covering sliding
    * window. */
  def assignSliding(df: DataFrame, t: Column, durationSec: Long, hopSec: Long,
      startCol: String = "window_start", endCol: String = "window_end"): DataFrame =
    df.withColumn(startCol, explode(slideStarts(t, durationSec, hopSec)))
      .withColumn(endCol, col(startCol) + durationSec * 1000000L)
      .withColumn(startCol, timestamp_micros(col(startCol)))
      .withColumn(endCol, timestamp_micros(col(endCol)))

  // -----------------------------------------------------------------
  // Session windows (reference: _window.py:595 session)
  // -----------------------------------------------------------------

  /** Gap-based sessionization: adds `session_start` per instance. One
    * shuffle (partitionBy keys) + in-partition sort; the cumulative-sum
    * formulation is the classic distributed sessionize and is exactly
    * SQL-window expressible (so the oracle can replay it). */
  def sessionize(df: DataFrame, t: Column, maxGapSec: Double, keys: Seq[Column],
      tieBreak: Seq[Column] = Nil, sessionCol: String = "session_start"): DataFrame = {
    val us = unix_micros(t)
    val order = (us +: tieBreak).map(c => c.asc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val gapUs = (maxGapSec * 1e6).toLong
    val isNew = when(lag(us, 1).over(w).isNull ||
      us - lag(us, 1).over(w) > gapUs, 1L).otherwise(0L)
    val withSess = df.withColumn("_sess_n", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, 0)))
    val wSess = Window.partitionBy((keys :+ col("_sess_n")): _*)
    withSess
      .withColumn(sessionCol, timestamp_micros(min(us).over(wSess)))
      .drop("_sess_n")
  }

  /** Predicate-based sessionization — merge neighbor into the session
    * while `chain(prevT, curT)` holds (reference: session w/ custom
    * predicate; cannot use a fixed gap). */
  def sessionizeBy(df: DataFrame, t: Column, keys: Seq[Column],
      chain: (Column, Column) => Column,
      tieBreak: Seq[Column] = Nil, sessionCol: String = "session_start"): DataFrame = {
    val us = unix_micros(t)
    val order = (us +: tieBreak).map(c => c.asc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val prev = lag(t, 1).over(w)
    val isNew = when(prev.isNull || !chain(prev, t), 1L).otherwise(0L)
    val withSess = df.withColumn("_sess_n", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, 0)))
    val wSess = Window.partitionBy((keys :+ col("_sess_n")): _*)
    withSess
      .withColumn(sessionCol, timestamp_micros(min(us).over(wSess)))
      .drop("_sess_n")
  }

  // -----------------------------------------------------------------
  // Interval join (reference: _interval_join.py:577-1404)
  // -----------------------------------------------------------------

  /** Join left/right where `rt - lt ∈ [lbSec, ubSec]` (inclusive both
    * ends — reference parity, _interval_join.py:640-680), plus equi keys.
    *
    * Implementation: bucket width = window width; every right row gets
    * one bucket, every left row probes the ≤2 buckets its window spans —
    * the range join becomes an equi join on (keys, bucket) that Catalyst
    * shuffles/broadcasts like any other. Degenerate lb==ub joins on the
    * exact shifted time (reference handles it separately,
    * _interval_join.py:211).
    *
    * Column contract: non-key columns of the two sides must have
    * DISJOINT names (rename before joining — the reference namespaces
    * `pw.left`/`pw.right`; Spark keeps both same-named columns and the
    * left/outer legs would then hit ambiguous-reference errors). Key
    * columns are deduplicated to one copy. `leftIdCols`/`rightIdCols`
    * must be non-null row identifiers (see [[asofJoinFull]]). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, lbSec: Double, ubSec: Double,
      keys: Seq[String] = Nil, how: String = "inner",
      leftIdCols: Seq[String] = Nil): DataFrame = {
    require(ubSec >= lbSec, "interval: ub must be >= lb")
    require(Set("inner", "left").contains(how), s"intervalJoin how=$how")
    require(how == "inner" || leftIdCols.nonEmpty,
      "intervalJoin(left): pass leftIdCols identifying left rows")
    val inner = intervalInner(left, right, lt, rt, lbSec, ubSec, keys)
    how match {
      case "inner" => inner
      case "left" =>
        // The inner result feeds BOTH the output and the matched-id
        // anti-join probe; persist so the bucketed join — the dominant
        // cost — executes once, not twice.
        val shared = graft.core.Caches.persist(inner, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // left rows with no partner, once each (anti on the ORIGINAL
        // left, not the bucket-exploded one), right columns null
        val rightOnly = right.columns.filterNot(left.columns.contains).toSeq
        val unmatched = withNullCols(
          left.join(shared.select(leftIdCols.map(col): _*).distinct(),
            leftIdCols, "left_anti"), right, rightOnly)
        shared.unionByName(unmatched, allowMissingColumns = true)
    }
  }

  /** The bucketed equi-join core shared by every interval-join variant:
    * bucket width = window width, each right row in one bucket, each left
    * row probing the ≤2 buckets its window spans. */
  private def intervalInner(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, lbSec: Double, ubSec: Double,
      keys: Seq[String]): DataFrame = {
    val lbUs = (lbSec * 1e6).toLong
    val ubUs = (ubSec * 1e6).toLong
    val w = math.max(ubUs - lbUs, 1L)
    val lUs = unix_micros(lt)
    val rUs = unix_micros(rt)
    val l = left
      .withColumn("_lo", lUs + lbUs).withColumn("_hi", lUs + ubUs)
      .withColumn("_b", explode(array_distinct(array(
        floor(col("_lo") / w).cast("long"), floor(col("_hi") / w).cast("long")))))
    // rename right key columns so the join keeps a single copy
    val r0 = right.withColumn("_rb", floor(rUs / w).cast("long"))
      .withColumn("_rt_us", rUs)
    val r = keys.foldLeft(r0)((d, k) => d.withColumnRenamed(k, s"_rk_$k"))
    val cond = keys.map(k => col(k) === col(s"_rk_$k"))
      .foldLeft(col("_b") === col("_rb") &&
        col("_rt_us") >= col("_lo") && col("_rt_us") <= col("_hi"))(_ && _)
    val helper = Seq("_lo", "_hi", "_b", "_rb", "_rt_us") ++ keys.map(k => s"_rk_$k")
    l.join(r, cond, "inner").drop(helper: _*)
  }

  /** Append `cols` (typed from `src`'s schema) as NULLs. */
  private def withNullCols(df: DataFrame, src: DataFrame,
      cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, lit(null).cast(src.schema(c).dataType)))

  // -----------------------------------------------------------------
  // As-of join (reference: _asof_join.py:479-1000)
  // -----------------------------------------------------------------

  /** For each left row, the latest (Backward) / earliest (Forward) /
    * nearest right row by time within the same instance keys.
    *
    * Union + ordered window: zero joins — one exchange on `keys`, one
    * in-partition sort, `last(ignoreNulls)` carries the right payload
    * forward. Equal timestamps match inclusively (backward sees a right
    * row at exactly lt). `rightCols` are emitted with nulls when no match
    * (left semantics); `how=inner` drops non-matches.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, keys: Seq[String],
      direction: Direction = Backward, how: String = "left",
      rightTieBreak: Column = lit(0)): DataFrame = {
    require(Set("inner", "left").contains(how), s"asofJoin how=$how")
    val lCols = left.columns.filterNot(keys.contains).toSeq
    val rCols = right.columns.filterNot(keys.contains).toSeq
    val lStruct = struct(lCols.map(c => left(c).as(c)): _*)
    val rStruct = struct(rCols.map(c => right(c).as(c)): _*)
    // a typed NULL of the struct type — NOT struct(null, …), which is a
    // non-null struct and would defeat last(…, ignoreNulls)
    def nullStruct(src: DataFrame, cols: Seq[String]): Column =
      lit(null).cast(org.apache.spark.sql.types.StructType(
        cols.map(c => org.apache.spark.sql.types.StructField(
          c, src.schema(c).dataType))))
    // side ordering at equal time: R sorts before L so the inclusive
    // match sees a right row at exactly lt.
    val (rSide, lSide) = (0, 1)
    val u = left.select(keys.map(col) :+ unix_micros(lt).as("_t") :+
        lit(lSide).as("_side") :+ lStruct.as("_l") :+
        nullStruct(right, rCols).as("_r") :+
        lit(0L).as("_tb"): _*)
      .unionByName(right.select(keys.map(col) :+ unix_micros(rt).as("_t") :+
        lit(rSide).as("_side") :+
        nullStruct(left, lCols).as("_l") :+
        rStruct.as("_r") :+ rightTieBreak.cast("long").as("_tb"): _*))
    val back = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // forward pass: reverse order so "previous" means next in time;
    // at equal t the right row still sorts before left (inclusive).
    val fwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side").asc, col("_tb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withMatch = direction match {
      case Backward =>
        u.withColumn("_m", last(col("_r"), ignoreNulls = true).over(back))
          .withColumn("_mt", last(when(col("_r").isNotNull, col("_t")),
            ignoreNulls = true).over(back))
      case Forward =>
        u.withColumn("_m", last(col("_r"), ignoreNulls = true).over(fwd))
          .withColumn("_mt", last(when(col("_r").isNotNull, col("_t")),
            ignoreNulls = true).over(fwd))
      case Nearest =>
        val b = last(col("_r"), ignoreNulls = true).over(back)
        val bt = last(when(col("_r").isNotNull, col("_t")), ignoreNulls = true).over(back)
        val f = last(col("_r"), ignoreNulls = true).over(fwd)
        val ft = last(when(col("_r").isNotNull, col("_t")), ignoreNulls = true).over(fwd)
        // tie -> backward (earlier) wins
        u.withColumn("_m",
            when(b.isNull, f).when(f.isNull, b)
              .when(col("_t") - bt <= ft - col("_t"), b).otherwise(f))
          .withColumn("_mt",
            when(b.isNull, ft).when(f.isNull, bt)
              .when(col("_t") - bt <= ft - col("_t"), bt).otherwise(ft))
    }
    val leftRows = withMatch.filter(col("_side") === lSide)
    val filtered = if (how == "inner") leftRows.filter(col("_m").isNotNull) else leftRows
    val proj = keys.map(col) ++
      lCols.map(c => col("_l").getField(c).as(c)) ++
      rCols.map(c => col("_m").getField(c).as(c))
    filtered.select(proj: _*)
  }

  /** Right/outer as-of variants (reference: _asof_join.py asof_join_right
    * /_outer): matching is identical (each LEFT row finds its right
    * partner); the variant controls which side's unmatched rows survive.
    * `rightIdCols` identify right rows for the anti-join — they must be
    * NON-NULL row identifiers: a NULL id cannot be told apart from the
    * null padding unmatched rows carry, so a null-id right row would be
    * re-emitted as unmatched even when it matched. Same contract as the
    * left/right non-key column namespaces: columns the two sides share
    * beyond `keys` must be renamed apart before joining (the operator
    * keeps one copy of key columns only). */
  def asofJoinFull(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, keys: Seq[String],
      direction: Direction = Backward, how: String = "left",
      rightIdCols: Seq[String] = Nil,
      rightTieBreak: Column = lit(0)): DataFrame = how match {
    case "inner" | "left" =>
      asofJoin(left, right, lt, rt, keys, direction, how, rightTieBreak)
    case "right" | "outer" =>
      require(rightIdCols.nonEmpty, s"asofJoinFull($how): pass rightIdCols")
      // base feeds BOTH the output and the matched-id probe; persist so
      // the union+window matching pass executes once, not twice.
      val base = graft.core.Caches.persist(
        asofJoin(left, right, lt, rt, keys, direction,
          if (how == "right") "inner" else "left", rightTieBreak),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val matched = base.select(rightIdCols.map(col): _*).na.drop().distinct()
      val leftOnly = left.columns.filterNot(right.columns.contains).toSeq
      val unmatchedRight = withNullCols(
        right.join(matched, rightIdCols, "left_anti"), left, leftOnly)
      base.unionByName(unmatchedRight, allowMissingColumns = true)
    case other => throw new IllegalArgumentException(s"asofJoinFull how=$other")
  }

  /** Right/outer interval-join variants: right = mirrored left
    * (Δt ∈ [lb,ub] ⇔ reversed Δt ∈ [-ub,-lb]); outer = left ∪ unmatched
    * right rows. */
  def intervalJoinFull(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, lbSec: Double, ubSec: Double,
      keys: Seq[String] = Nil, how: String = "inner",
      leftIdCols: Seq[String] = Nil, rightIdCols: Seq[String] = Nil): DataFrame =
    how match {
      case "inner" | "left" =>
        intervalJoin(left, right, lt, rt, lbSec, ubSec, keys, how, leftIdCols)
      case "right" =>
        intervalJoin(right, left, rt, lt, -ubSec, -lbSec, keys, "left", rightIdCols)
      case "outer" =>
        require(leftIdCols.nonEmpty && rightIdCols.nonEmpty,
          "intervalJoinFull(outer): pass leftIdCols and rightIdCols")
        // One persisted inner feeds all three legs (matched output,
        // unmatched-left probe, unmatched-right probe) — previously the
        // bucketed join subtree executed three times here.
        val shared = graft.core.Caches.persist(
          intervalInner(left, right, lt, rt, lbSec, ubSec, keys),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rightOnly = right.columns.filterNot(left.columns.contains).toSeq
        val leftOnly = left.columns.filterNot(right.columns.contains).toSeq
        val unmatchedLeft = withNullCols(
          left.join(shared.select(leftIdCols.map(col): _*).distinct(),
            leftIdCols, "left_anti"), right, rightOnly)
        val unmatchedRight = withNullCols(
          right.join(shared.select(rightIdCols.map(col): _*).distinct(),
            rightIdCols, "left_anti"), left, leftOnly)
        shared.unionByName(unmatchedLeft, allowMissingColumns = true)
          .unionByName(unmatchedRight, allowMissingColumns = true)
      case other => throw new IllegalArgumentException(s"intervalJoinFull how=$other")
    }

  // -----------------------------------------------------------------
  // Window join (reference: _window_join.py:156-996)
  // -----------------------------------------------------------------

  /** Join rows whose tumbling windows coincide: assign the window start
    * on both sides, then plain equi join on (keys, window_start). */
  def windowJoinTumbling(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, durationSec: Long, keys: Seq[String],
      how: String = "inner"): DataFrame = {
    val l = left.withColumn("_w", tumble(lt, durationSec))
    val r = right.withColumn("_w", tumble(rt, durationSec))
    l.join(r, keys :+ "_w", how).withColumnRenamed("_w", "window_start")
  }

  /** Sliding window join (reference: _window_join.py:156 — sliding
    * windows, all four modes): each row joins once per covering window,
    * so both sides explode into (row, window_start) assignments — a row
    * lands in ceil(duration/hop) windows — and the range-coincidence
    * join becomes a plain equi join on (keys, window_start) that
    * shuffles/broadcasts like any other. Unmatched rows in left/right/
    * outer modes surface once per window assignment, matching the
    * reference's per-window join semantics. */
  def windowJoinSliding(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, durationSec: Long, hopSec: Long,
      keys: Seq[String], how: String = "inner"): DataFrame = {
    val l = left.withColumn("_w", explode(slideStarts(lt, durationSec, hopSec)))
    val r = right.withColumn("_w", explode(slideStarts(rt, durationSec, hopSec)))
    l.join(r, keys :+ "_w", how)
      .withColumn("window_start", timestamp_micros(col("_w"))).drop("_w")
  }

  /** Session window join (reference: _window_join.py:156 — session
    * windows): sessions are formed over the UNION of both sides' event
    * times per key (the reference merges both inputs before gap
    * detection, so a left row and a right row chain into one session
    * even when each side alone would time out). Each side is then
    * assigned its session start by (keys, time) lookup and the join is
    * equi on (keys, session_start). Two window shuffles + two equi
    * joins, all on the same key — co-partitioned end to end. */
  def windowJoinSession(left: DataFrame, right: DataFrame,
      lt: Column, rt: Column, maxGapSec: Double, keys: Seq[String],
      how: String = "inner"): DataFrame = {
    val kc = keys.map(col)
    val merged = left.select((kc :+ lt.as("_t")): _*)
      .unionByName(right.select((kc :+ rt.as("_t")): _*)).distinct()
    // (keys, time) -> session_start lookup; distinct() above makes the
    // mapping unique, so assignment multiplies no rows
    val sess = sessionize(merged, col("_t"), maxGapSec, kc)
      .select((keys.map(k => col(k).as(s"_sk_$k")) :+
        col("_t").as("_st") :+ col("session_start")): _*)
    def assign(side: DataFrame, t: Column): DataFrame =
      side.join(sess,
          keys.map(k => col(k) === col(s"_sk_$k")).reduce(_ && _) && t === col("_st"))
        .drop((keys.map(k => s"_sk_$k") :+ "_st"): _*)
    val l = assign(left, lt)
    val r = assign(right, rt)
    l.join(r, keys :+ "session_start", how)
  }

  // -----------------------------------------------------------------
  // intervals_over (reference: _window.py:795 _IntervalsOverWindow)
  // -----------------------------------------------------------------

  /** For each probe time, gather data rows with t ∈ [probe+lb, probe+ub]
    * (inclusive). Returns probe columns + data columns, one row per
    * (probe, matching datum) — caller aggregates. Bucketed equi join
    * underneath (see intervalJoin). */
  def intervalsOver(probes: DataFrame, data: DataFrame,
      probeT: Column, dataT: Column, lbSec: Double, ubSec: Double,
      keys: Seq[String] = Nil): DataFrame =
    intervalJoin(probes, data, probeT, dataT, lbSec, ubSec, keys, "inner")
}
