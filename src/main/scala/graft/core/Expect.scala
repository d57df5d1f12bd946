package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Delta CHECK-constraint /
  * dbt-test shape for pipeline gates: assert row-level predicates over
  * a table, get a violation report, a valid/invalid split, or a hard
  * failure. A 100 TB ingest wants all three at different points: report
  * for monitoring, split for quarantine-and-continue, enforce for
  * correctness gates before a publish.
  *
  * A rule VIOLATES when its predicate is false OR NULL — an expectation
  * that silently passes NULLs doesn't assert anything (the SQL CHECK
  * trap); state nullability explicitly (`c.isNull || c > 0`) when NULL
  * is acceptable.
  */
object Expect {

  private def violates(c: Column): Column = c.isNull || !c

  /** Violation report: one row per rule — (rule, n_violations, n_rows).
    * ONE aggregation pass over the table whatever the rule count (each
    * rule is a conditional sum — map-side combinable), then a constant
    * explode of the single result row. */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "Expect.check: no rules given")
    val aggs = count(lit(1)).as("_n") +: rules.map { case (name, c) =>
      sum(when(violates(c), 1L).otherwise(0L)).as(name) }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(name).as("n_violations"),
          col("_n").as("n_rows")) }: _*)).as("r"))
      .select("r.*")
  }

  /** Quarantine split: (valid rows, violating rows + `_violated` — the
    * names of every rule each row broke). One scan per side of the
    * split, all predicates map-side; at scale write the invalid side to
    * a quarantine table and keep the pipeline moving. */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "Expect.split: no rules given")
    val broken = array_compact(array(rules.map { case (name, c) =>
      when(violates(c), lit(name)) }: _*))
    val tagged = df.withColumn("_violated", broken)
    (tagged.filter(size(col("_violated")) === 0).drop("_violated"),
      tagged.filter(size(col("_violated")) > 0))
  }

  /** Hard gate: runs [[check]] EAGERLY and throws (listing every failed
    * rule with counts) if any rule has violations; returns `df`
    * unchanged otherwise. The action is the point — a publish step
    * calls this before writing. */
  def enforce(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val bad = check(df, rules).filter(col("n_violations") > 0).collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r =>
        s"${r.getString(0)}: ${r.getLong(1)}/${r.getLong(2)} rows").mkString("; ")
      throw new IllegalStateException(s"Expect.enforce failed — $detail")
    }
    df
  }
}
