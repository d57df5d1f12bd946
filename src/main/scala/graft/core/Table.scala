package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Keyed table — the engine's only user-facing collection.
  *
  * Mirrors the reference's `Table` (reference:
  * python/pathway/internals/table.py:52): a relation with a synthetic
  * primary key. The reference materializes the key as a 128-bit `Pointer`
  * in every row (src/engine/value.rs:41); at 100 TB that is wasted bytes
  * and — worse — computing a hash of all columns at scan time defeats
  * parquet column pruning. We instead keep the key *symbolic*: `key` names
  * the column set that identifies a row, keyed operators (intersect /
  * difference / restrict / update_cells / update_rows / ix / concat) join
  * on those columns directly, and Catalyst prunes + pushes down as usual.
  * A physical 16-byte pointer column is only materialized on demand via
  * [[withId]] (graft.functions.pointer_from).
  *
  * Universe relations (reference: internals/universe_solver.py:14 — a SAT
  * solver proving key-set subset/equality) have no Spark analog and none
  * is needed: keyed ops are explicit joins and Catalyst dedupes identical
  * exchanges. `withUniverseOf` is provided as a checked semi-join.
  */
final class Table(val df: DataFrame, val key: Seq[String]) {
  import Table._

  def spark: SparkSession = df.sparkSession
  private def keyCols: Seq[Column] = key.map(df.col)
  private def derive(d: DataFrame): Table = new Table(d, key)

  // -- projection / row-wise (reference: table.py:382 select, :1613
  //    with_columns, :490 filter, :531 split, :1921 without, :1763 renames)
  def select(cols: (String, Column)*): Table = {
    // keys are implicit in every projection, but one the caller re-defines
    // must come from the caller's expression — prepending it too would
    // duplicate the column name and poison every later keyed op
    val redefined = cols.map(_._1).toSet
    new Table(df.select((key.filterNot(redefined).map(k => df.col(k)) ++
      cols.map { case (n, c) => c.as(n) }): _*), key)
  }
  def withColumns(cols: (String, Column)*): Table =
    derive(df.withColumns(cols.toMap))
  def filter(cond: Column): Table = derive(df.filter(cond))
  def split(cond: Column): (Table, Table) =
    (filter(cond), filter(!coalesce(cond, lit(false))))
  def without(cols: String*): Table = derive(df.drop(cols: _*))
  def renameColumns(renames: (String, String)*): Table = {
    val m = renames.toMap
    new Table(
      df.select(df.columns.map(c => df.col(c).as(m.getOrElse(c, c))): _*),
      key.map(k => m.getOrElse(k, k)))
  }
  def castToTypes(types: (String, String)*): Table =
    derive(types.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, d.col(c).cast(t)) })
  def copy(): Table = derive(df.alias(java.util.UUID.randomUUID.toString.take(8)))

  // -- keyed set operations --------------------------------------------
  /** Keyed union; keys must be disjoint — duplicate keys are an error
    * (reference: table.py:1334 concat; dup→Error via
    * src/engine/dataflow.rs:895 ReplaceDuplicatesWithError). The check is
    * distributed (window count over the key — one shuffle, no collect). */
  def concat(others: Table*): Table = {
    val all = others.foldLeft(df)((a, t) => a.unionByName(t.df))
    val w = Window.partitionBy(key.map(col): _*)
    // the check must live in a FILTER — a raising projection column that
    // is later dropped gets pruned by Catalyst and never evaluates
    derive(
      all.withColumn("_dup", count(lit(1)).over(w))
        .filter(when(col("_dup") > 1,
          raise_error(lit("concat: duplicate key"))).otherwise(lit(true)))
        .drop("_dup"))
  }
  /** concat without the disjointness check — no extra shuffle; use when
    * keys are disjoint by construction (e.g. output of split). */
  def concatUnchecked(others: Table*): Table =
    derive(others.foldLeft(df)((a, t) => a.unionByName(t.df)))
  /** Union + re-key (reference: table.py:308 concat_reindex). */
  def concatReindex(newKey: Seq[String], others: Table*): Table =
    new Table(others.foldLeft(df)((a, t) => a.unionByName(t.df)), newKey)

  /** Rows whose key appears in every other table
    * (reference: table.py:776 intersect; graph.rs:827 intersect_tables). */
  def intersect(others: Table*): Table =
    derive(others.foldLeft(df)((a, t) => a.join(t.keyOnly, key, "left_semi")))
  /** Rows whose key is absent from `other`
    * (reference: table.py:739 difference; graph.rs:834 subtract_table). */
  def difference(other: Table): Table =
    derive(df.join(other.keyOnly, key, "left_anti"))
  /** Restrict to `other`'s key set (reference: table.py:837). */
  def restrict(other: Table): Table =
    derive(df.join(other.keyOnly, key, "left_semi"))
  /** Filter by key presence in an indexer (reference: table.py:2027). */
  def having(indexer: Table): Table = restrict(indexer)
  /** Align to other's universe (reference: table.py:2037
    * with_universe_of; universes proven equal by
    * internals/universe_solver.py:14). The reference's promise is CHECKED
    * here: a full-outer join of the two key sets flags any key present on
    * only one side and raises — distributed (co-partitioned join on the
    * key, no collect), and free when the universes match. The raising
    * check lives in a FILTER (a dropped projection would be pruned). */
  def withUniverseOf(other: Table): Table = {
    val l = keyOnly.withColumn("_l", lit(1))
    val r = other.df.select(key.map(col): _*).distinct().withColumn("_r", lit(1))
    val checked = l.join(r, key, "full_outer")
      .filter(when(col("_l").isNull || col("_r").isNull,
        raise_error(lit("with_universe_of: universes are not equal")))
        .otherwise(lit(true)))
      .select(key.map(col): _*)
    derive(df.join(checked, key, "left_semi"))
  }
  private def keyOnly: DataFrame = df.select(key.map(col): _*).distinct()

  /** Raise (distributed, filter-borne like [[concat]]'s check) if `d`
    * carries a duplicate key — the reference errors on duplicate update
    * keys (ReplaceDuplicatesWithError); a silent duplicate here would
    * fan out every matching row. */
  private def requireUniqueKeys(d: DataFrame, op: String): DataFrame = {
    val w = Window.partitionBy(key.map(d.col): _*)
    d.withColumn("_dup", count(lit(1)).over(w))
      .filter(when(col("_dup") > 1,
        raise_error(lit(s"$op: duplicate key in update table"))).otherwise(lit(true)))
      .drop("_dup")
  }

  /** Overwrite cell values for matching keys
    * (reference: table.py:1439 update_cells / `<<`;
    * graph.rs:876 update_cells_table). A matching key replaces the cell
    * even when the new value is NULL — presence in `other` is the
    * update signal, not non-nullness (a coalesce here would make NULLs
    * un-writable). */
  def updateCells(other: Table): Table = {
    val shared = other.df.columns.toSeq.filterNot(key.contains).filter(df.columns.contains)
    val o = requireUniqueKeys(other.df.select((key ++ shared).map(col): _*),
        "update_cells")
      .withColumnsRenamed(shared.map(c => c -> s"_new_$c").toMap)
      .withColumn("_hit", lit(true))
    val joined = df.join(o, key, "left")
    derive(shared.foldLeft(joined)((d, c) =>
      d.withColumn(c, when(col("_hit"), col(s"_new_$c")).otherwise(col(c)))
        .drop(s"_new_$c")).drop("_hit"))
  }

  /** Upsert rows by key (reference: table.py:1524 update_rows;
    * graph.rs:869 update_rows_table). New rows win entirely. */
  def updateRows(other: Table): Table = {
    require(df.columns.sorted.sameElements(other.df.columns.sorted),
      "update_rows: schemas must match")
    derive(requireUniqueKeys(other.df, "update_rows")
      .unionByName(df.join(other.keyOnly, key, "left_anti")))
  }

  /** Re-key the table (reference: table.py:1690 with_id_from;
    * graph.rs:862 reindex_table). */
  def withIdFrom(cols: String*): Table = new Table(df, cols.toSeq)

  /** Materialize the 128-bit pointer column (reference id: Pointer,
    * value.rs:41). */
  def withId(idCol: String = "id"): Table =
    derive(df.withColumn(idCol, graft.functions.pointer_from(keyCols: _*)))

  /** Row lookup by key — a dictionary get across tables
    * (reference: table.py:1164 ix; graph.rs:923 ix_table). `keys` holds
    * this table's key columns; broadcast it if small. */
  def ix(keys: Table, optional: Boolean = false): Table = {
    val how = if (optional) "left" else "inner"
    new Table(keys.df.join(df, key, how), keys.key)
  }

  /** Explode an array column, duplicating the rest
    * (reference: table.py:2089 flatten; graph.rs:847). Adds `_origin_pos`
    * so the origin row is recoverable (reference exposes origin_id).
    * A STRING column flattens to its characters — reference parity
    * (the flatten doctest explodes "Dog" into D/o/g). */
  def flatten(column: String, posCol: String = "_origin_pos"): Table = {
    val others = df.columns.filterNot(_ == column).map(col)
    val src =
      if (df.schema(column).dataType == org.apache.spark.sql.types.StringType)
        org.apache.spark.sql.functions.split(col(column), "")
      else col(column)
    new Table(
      df.select(others :+ posexplode(src).as(Seq(posCol, column)): _*),
      key :+ posCol)
  }

  // -- ordering (reference: table.py:2157 sort → prev/next pointers) ----
  /** Linked-list order: adds prev/next key structs per instance, mirroring
    * the reference's sort (operators/prev_next.rs). One shuffle on
    * `instance`, then lag/lead — no global sort. */
  def sortLinked(orderBy: Seq[Column], instance: Column): Table = {
    val w = Window.partitionBy(instance).orderBy(orderBy: _*)
    val keyStruct = struct(keyCols: _*)
    derive(df
      .withColumn("prev", lag(keyStruct, 1).over(w))
      .withColumn("next", lead(keyStruct, 1).over(w)))
  }

  /** Value minus previous value in timestamp order
    * (reference: stdlib/ordered/diff.py:10). */
  def diff(orderBy: Seq[Column], instance: Option[Column], values: String*): Table = {
    val w = instance.map(i => Window.partitionBy(i)).getOrElse(Window.partitionBy())
      .orderBy(orderBy: _*)
    derive(values.foldLeft(df)((d, v) =>
      d.withColumn(s"diff_$v", col(v) - lag(col(v), 1).over(w))))
  }

  /** Linear interpolation of nulls using prev/next known points
    * (reference: stdlib/statistical/_interpolate.py:33). `instance`
    * partitions the timeline (one window partition per key) — the form
    * to use at scale; `None` interpolates over the global order, which
    * moves all rows through a single partition and is only acceptable
    * for small frames. */
  def interpolate(timestamp: Column, tieBreak: Seq[Column],
      instance: Option[Column], values: String*): Table = {
    val wAll = instance.map(i => Window.partitionBy(i)).getOrElse(Window.partitionBy())
      .orderBy((timestamp +: tieBreak).map(_.asc): _*)
    val wB = wAll.rowsBetween(Window.unboundedPreceding, 0)
    val wF = wAll.rowsBetween(0, Window.unboundedFollowing)
    val ts = timestamp.cast("double")
    derive(values.foldLeft(df) { (d, v) =>
      val pv = last(col(v), ignoreNulls = true).over(wB)
      val pt = last(when(col(v).isNotNull, ts), ignoreNulls = true).over(wB)
      val nv = first(col(v), ignoreNulls = true).over(wF)
      val nt = first(when(col(v).isNotNull, ts), ignoreNulls = true).over(wF)
      d.withColumn(v,
        when(col(v).isNotNull, col(v))
          .when(pv.isNull, nv)
          .when(nv.isNull, pv)
          // duplicate timestamps (tieBreak admits them) collapse the
          // bracket to zero width; x/0 is SQL-NULL, which would leave the
          // gap unfilled — take the previous known value instead
          .when(nt === pt, pv)
          .otherwise(pv + (nv - pv) * (ts - pt) / (nt - pt)))
    })
  }

  // -- grouping ----------------------------------------------------------
  /** reference: table.py:942 groupby → groupbys.py:158 reduce. */
  def groupby(cols: Column*): GroupedTable = new GroupedTable(df, cols)
  def reduce(aggs: (String, Column)*): DataFrame =
    df.agg(aggs.head._2.as(aggs.head._1),
      aggs.tail.map { case (n, c) => c.as(n) }: _*)

  /** Hierarchical subtotals: one reduce over every grouping PREFIX of
    * `cols` (full detail → … → grand total), the ANSI ROLLUP. Spark
    * plans this as a single Expand (each input row replicated once per
    * level, map-side) feeding ONE hash aggregate — levels+1 subtotal
    * layers for one shuffle, far cheaper at scale than unioning
    * per-level groupbys (which would rescan the input per level).
    * Aggregated-away key columns come back NULL; disambiguate data
    * NULLs with `grouping_id()` in the agg list. */
  def groupbyRollup(cols: Column*): GroupedTable =
    new GroupedTable(df, cols, GroupedTable.Rollup)

  /** Subtotals over EVERY subset of `cols` (the ANSI CUBE) — same
    * single-Expand single-shuffle plan as [[groupbyRollup]], 2^k
    * layers; keep k small by construction. */
  def groupbyCube(cols: Column*): GroupedTable =
    new GroupedTable(df, cols, GroupedTable.Cube)

  /** Explicit grouping-set list (ANSI GROUPING SETS) — the general
    * form of rollup/cube: one Expand replica per listed set, one
    * shuffle. Columns absent from a set come back NULL in its rows. */
  def groupbyGroupingSets(sets: Seq[Seq[Column]], cols: Column*): GroupedTable =
    new GroupedTable(df, cols, GroupedTable.Sets(sets))

  /** Long → wide: one output column per `values` entry, cells from
    * `agg` over the matching rows. `values` is REQUIRED (not
    * discovered): an explicit list keeps the schema static — no extra
    * distinct-scan job, no schema dependent on data — and pivoting
    * stays ONE ordinary hash aggregate (each value a conditional
    * branch), same single shuffle as the groupby. Unlisted pivot
    * values are dropped, like SQL PIVOT ... IN (...). */
  def pivot(groupCols: Seq[Column], pivotCol: Column, values: Seq[Any],
      agg: Column): DataFrame =
    df.groupBy(groupCols: _*).pivot(pivotCol, values).agg(agg)

  /** Wide → long: id columns replicated, each (name, value) of `valueCols`
    * emitted as one row. Pure map-side Expand — no shuffle at all. */
  def unpivot(ids: Seq[Column], valueCols: Seq[Column],
      varName: String, valName: String): DataFrame =
    df.unpivot(ids.toArray, valueCols.toArray, varName, valName)

  // -- joins (reference: internals/joins.py:135-484) ---------------------
  def join(other: Table, cond: Column, how: String = "inner"): Table =
    new Table(df.join(other.df, cond, how), key)
  def joinOn(other: Table, usingCols: Seq[String], how: String = "inner"): Table =
    new Table(df.join(other.df, usingCols, how), key)
  /** Join against a small slowly-changing table, broadcast to every
    * executor — Spark's exact broadcast hash join, for when the small
    * side's values must reach every row exactly. For the reference's
    * *approximate* threshold-walk broadcast see [[gradualBroadcast]]. */
  def joinBroadcast(other: Table, cond: Column, how: String = "inner"): Table =
    new Table(df.join(broadcast(other.df), cond, how), key)

  /** Gradual broadcast (reference: table.py:631 _gradual_broadcast /
    * engine operators/gradual_broadcast.rs:128 get_threshold,
    * :183 apply_to_fragment): attach an `apx_value` column from a
    * one-row `(lower, value, upper)` threshold triplet WITHOUT joining —
    * each row's hashed key is compared against
    * `threshold = (value−lower)/(upper−lower) × keySpace`, rows whose
    * hash falls below get `upper`, the rest `lower`. As `value` walks
    * from `lower` to `upper`, a monotonically growing fraction of the
    * uniform key space flips to the upper bound — the reference uses
    * this inside Louvain (louvain_communities/impl.py:313) to anneal a
    * threshold over rows with only O(changed-fragment) retractions.
    *
    * Spark-first shape: the triplet is a broadcast one-row frame (a
    * `BroadcastNestedLoopJoin` the optimizer folds into a scan-side
    * projection), the key hash is the engine-portable md5 recipe used by
    * [[graft.operators.Sampling]] (first 8 hex chars → uniform 32-bit
    * space), and the whole operator is one codegen'd projection — no
    * shuffle, no driver round-trip, safe at any row count. The reference
    * asserts one live triplet (gradual_broadcast.rs:283 "Gradual
    * broadcast sees inconsistent stream"); here a >1-row triplet frame
    * would silently duplicate rows, so the contract is the same: pass a
    * 1-row aggregate. */
  def gradualBroadcast(thresholds: DataFrame, lower: Column, value: Column,
      upper: Column, apxName: String = "apx_value"): Table = {
    require(key.nonEmpty, "gradualBroadcast needs a keyed table (row hash = key hash)")
    val t = broadcast(thresholds.select(
      lower.cast("double").as("_gb_lo"), value.cast("double").as("_gb_va"),
      upper.cast("double").as("_gb_up")))
    val h = conv(substring(md5(org.apache.spark.sql.functions.concat(
      lit("gb") +: key.map(k => df.col(k).cast("string")): _*)),
      1, 8), 16, 10).cast("long")
    // degenerate triplet (upper == lower): the walk has zero width, so
    // nothing flips — threshold 0 gives every row the lower bound (the
    // value IS both bounds). Unguarded, ANSI mode would abort the job
    // on the x/0 (Spark 4 raises even for doubles).
    val threshold = when(col("_gb_up") === col("_gb_lo"), lit(0L))
      .otherwise(floor((col("_gb_va") - col("_gb_lo")) /
        (col("_gb_up") - col("_gb_lo")) * lit(4294967296.0)).cast("long"))
    new Table(
      df.join(t)
        .withColumn(apxName, when(h < threshold, col("_gb_up")).otherwise(col("_gb_lo")))
        .drop("_gb_lo", "_gb_va", "_gb_up"),
      key)
  }

  /** Skew-resistant equi-join: salt this (large, skewed) side into
    * `buckets` sub-keys via a deterministic hash of the whole row,
    * replicate `other` (the smaller side) once per bucket, join on
    * (key, salt). Use when one join key carries a disproportionate share
    * of rows and AQE's skew handling isn't available/enough; salting
    * spreads the hot key over `buckets` tasks. */
  def joinSalted(other: Table, usingCols: Seq[String], buckets: Int,
      how: String = "inner"): Table = {
    require(how == "inner" || how == "left" || how == "left_outer",
      s"salted join supports inner/left only — the replicated right side " +
        s"would emit unmatched right rows once per salt under '$how'")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(df.col): _*), lit(buckets)).cast("int"))
    val replicated = other.df.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    new Table(
      salted.join(replicated, usingCols :+ "_salt", how).drop("_salt"), key)
  }

  /** Bloom-pruned equi-join: build a bloom filter over `other`'s (small
    * side) join keys, filter THIS (large) side map-side with a codegen'd
    * probe, then run the exact join on the survivors — identical results
    * to [[joinOn]], but only rows that might match reach the shuffle.
    * The scale tool for sparse semi-joins over a side too big to
    * broadcast (decontamination against a benchmark set, allowlist
    * restriction): at 100 TB the exchange of the big side is the
    * bottleneck, and the bloom drops all but `fpp` of non-matching rows
    * before it. See [[graft.plans.BloomPrune]] for the contract.
    *
    * `inner`/`left_semi` only — a pruned row would need to resurface
    * null-extended under outer modes. `expectedItems` ≤ 0 derives the
    * filter size from a count of `other` (one extra small-side job). */
  def joinBloomPruned(other: Table, usingCols: Seq[String],
      how: String = "inner", expectedItems: Long = -1L,
      fpp: Double = 0.01): Table = {
    require(how == "inner" || how == "left_semi",
      s"joinBloomPruned supports inner/left_semi only, got '$how' — " +
        "outer modes must keep non-matching rows the filter would drop")
    val n = if (expectedItems > 0) expectedItems else math.max(1L, other.df.count())
    val filter = graft.plans.BloomPrune.buildFilter(
      other.df, usingCols.map(other.df.col), n, fpp)
    val pruned = df.filter(graft.plans.BloomPrune.mightContain(
      filter, usingCols.map(df.col)))
    val joined = pruned.join(other.df, usingCols, how)
    // using-column joins surface the join keys first; for semi (left
    // columns only) restore THIS table's column order so the pruned
    // join is schema-identical to the unpruned table
    val out = if (how == "left_semi")
      joined.select(df.columns.map(joined.col).toIndexedSeq: _*)
    else joined
    new Table(out, key)
  }

  /** Bloom-accelerated ANTI join — the decontamination/blocklist shape
    * at scale. The bloom's one-sided guarantee inverts here: a row that
    * FAILS the probe is provably absent from `other` and passes the anti
    * join directly — no shuffle, no state; only the small might-match
    * slice (true matches + the `fpp` false-positive sliver) runs the
    * exact anti join. Results are identical to a plain left_anti. The
    * big side is branch-scanned twice (miss branch + maybe branch) —
    * at 100 TB two pruned columnar scans beat one full-table exchange
    * whenever most rows are clean, which is the entire premise of a
    * blocklist. */
  def joinBloomAnti(other: Table, usingCols: Seq[String],
      expectedItems: Long = -1L, fpp: Double = 0.01): Table = {
    val n = if (expectedItems > 0) expectedItems else math.max(1L, other.df.count())
    val filter = graft.plans.BloomPrune.buildFilter(
      other.df, usingCols.map(other.df.col), n, fpp)
    val p = graft.plans.BloomPrune.mightContain(filter, usingCols.map(df.col))
    val definiteMiss = df.filter(!p)
    val maybe = df.filter(p).join(other.df, usingCols, "left_anti")
    new Table(definiteMiss.unionByName(maybe), key)
  }

  /** Drop rows carrying error values (reference: table.py:2491
    * remove_errors; engine graph.rs:1005). In the Spark mapping soft
    * errors are `try_*` NULLs — this drops rows where any given column
    * (default: all) is null. */
  def removeErrors(cols: String*): Table = {
    val cs = if (cols.nonEmpty) cols.toSeq else df.columns.toSeq
    derive(df.filter(cs.map(c => df.col(c).isNotNull).reduce(_ && _)))
  }

  /** Split into (clean, errored) on soft-error columns — the reference's
    * global error-log pattern (internals/errors.py: failed rows route to
    * a side table instead of poisoning the pipeline). */
  def splitErrors(cols: String*): (Table, Table) = {
    val cs = if (cols.nonEmpty) cols.toSeq else df.columns.toSeq
    val ok = cs.map(c => df.col(c).isNotNull).reduce(_ && _)
    (derive(df.filter(ok)), derive(df.filter(!ok)))
  }

  // -- dedup (reference: table.py:1064 deduplicate, acceptor-based) ------
  /** Keep the last accepted value per instance, scanning in `orderBy`
    * order with a user acceptor deciding whether a new value replaces the
    * previous one. Distributed per-instance scan via window + a single
    * groupBy — acceptorless fast path keeps it fully declarative. */
  def deduplicateLatest(orderBy: Column, instance: Seq[String]): Table = {
    // rows tying on orderBy would otherwise be ranked by partition
    // arrival order — which row survives would change run to run. A
    // struct over the row's ORDERABLE columns is a deterministic content
    // tie-break (same input rows → same survivor, on any engine or
    // partitioning); map-typed columns have no SQL ordering and are left
    // out of the tie-break.
    def orderable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val contentTb = struct(
      df.schema.fields.filter(f => orderable(f.dataType)).map(f => df.col(f.name)): _*)
    val w = Window.partitionBy(instance.map(col): _*)
      .orderBy(orderBy.desc, contentTb.desc)
    derive(df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn"))
  }

  def cache(): Table = derive(df.cache())
  def explainPlan(): Unit = df.explain("formatted")
}

object Table {
  /** Source table; key defaults to all columns (the reference derives ids
    * from full rows when no primary key is declared). */
  def fromDF(df: DataFrame, key: Seq[String] = Nil): Table =
    new Table(df, if (key.nonEmpty) key else df.columns.toSeq)
  def read(spark: SparkSession, path: String, key: Seq[String] = Nil): Table =
    fromDF(spark.read.parquet(path), key)
  /** reference: table.py:355 Table.empty. */
  def empty(spark: SparkSession, schema: org.apache.spark.sql.types.StructType): Table =
    fromDF(spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
}

/** Grouped view (reference: internals/groupbys.py:71 GroupedTable). */
final class GroupedTable(df: DataFrame, groupCols: Seq[Column],
    mode: GroupedTable.Mode = GroupedTable.Flat) {
  def reduce(aggs: (String, Column)*): DataFrame = {
    val grouped = mode match {
      case GroupedTable.Flat => df.groupBy(groupCols: _*)
      case GroupedTable.Rollup => df.rollup(groupCols: _*)
      case GroupedTable.Cube => df.cube(groupCols: _*)
      case GroupedTable.Sets(sets) => df.groupingSets(sets, groupCols: _*)
    }
    grouped.agg(aggs.head._2.as(aggs.head._1),
      aggs.tail.map { case (n, c) => c.as(n) }: _*)
  }
}

object GroupedTable {
  sealed trait Mode
  case object Flat extends Mode
  case object Rollup extends Mode
  case object Cube extends Mode
  final case class Sets(sets: Seq[Seq[Column]]) extends Mode
}
