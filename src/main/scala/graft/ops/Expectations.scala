package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the data-contract gate a
  * training-data pipeline runs before anything downstream trusts a
  * batch (the Deequ / dbt-test / Delta-constraint role, relationally:
  * no enforcement hooks in parquet, so violations are REPORTED and the
  * caller gates). Complements the FK-orphan QA pass
  * (etl/WarehouseQa.scala), which keeps referential checks.
  *
  * Every row-level rule compiles to a violation predicate counted in
  * ONE aggregation over ONE scan of the frame, however many rules —
  * the whole report costs a single column-pruned pass. Uniqueness
  * rules ride the same aggregation as `count(*) − count(distinct
  * struct(cols))` (Catalyst plans the distinct via expand on the same
  * scan). Null semantics follow SQL constraints: NULL violates only
  * `notNull` — range/set/regex rules skip NULLs rather than
  * double-counting them.
  */
object Expectations {

  sealed trait Rule { def name: String }

  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }
  /** Violated by non-null values outside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($column)"
  }
  /** Violated by non-null values outside the accepted set. */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    val name = s"accepted_values($column)"
  }
  /** Violated by non-null values NOT matching the (unanchored) regex. */
  final case class MatchesRegex(column: String, pattern: String) extends Rule {
    val name = s"matches_regex($column)"
  }
  /** Violated by every row beyond the first per key tuple. */
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique(${columns.mkString(",")})"
  }

  private def violation(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case AcceptedValues(c, vs) =>
      col(c).isNotNull && !col(c).isin(vs: _*)
    case MatchesRegex(c, p) =>
      col(c).isNotNull && !col(c).rlike(p)
    case _: Unique =>
      throw new IllegalStateException("unique is aggregated, not row-level")
  }

  /** Per-group report — the contract MONITOR: same rules, one row per
    * (group, rule), so a failing batch pinpoints WHICH day/source/
    * partition broke which contract instead of one table-wide number.
    * Uniqueness is scoped WITHIN each group (one key per day, etc.).
    * Still one aggregation over one scan.
    */
  def checkByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    require(groupCols.nonEmpty, "use check() for the ungrouped report")
    val aggs = rules.zipWithIndex.map {
      case (u: Unique, i) =>
        (count(lit(1)) - count_distinct(struct(u.columns.map(col): _*)))
          .as(s"__v_$i")
      case (r, i) =>
        count(when(violation(r), lit(1))).as(s"__v_$i")
    } :+ count(lit(1)).as("__total")
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    grouped.select((groupCols.map(col) :+
      explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(
          lit(r.name).as("rule"),
          col(s"__v_$i").as("violations"),
          col("__total").as("rows_checked"),
          (col(s"__v_$i") === 0L).as("pass"))
      }: _*)).as("r")): _*)
      .select((groupCols.map(col) :+ col("r.rule").as("rule") :+
        col("r.violations").as("violations") :+
        col("r.rows_checked").as("rows_checked") :+
        col("r.pass").as("pass")): _*)
  }

  /** Row-level split: every input row tagged with the ROW-LEVEL rules
    * it violates — `__dq_reasons` as a '|'-joined, declaration-ordered
    * string, empty for clean rows — so the caller routes
    * `filter(__dq_reasons == "")` onward and quarantines the rest with
    * their reasons attached (the dead-letter pattern; [[check]] is the
    * aggregate gate, this is the router). Uniqueness rules are
    * aggregate-scoped and deliberately rejected here: attributing
    * "duplicate" to specific rows needs a per-key window — an
    * ordering policy the caller must choose, not a row property.
    * One projection, no shuffle, stays in whole-stage codegen.
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    require(!rules.exists(_.isInstanceOf[Unique]),
      "unique() is aggregate-scoped — row-level quarantine can't attribute it")
    val reasons = concat_ws("|", rules.map(r =>
      when(violation(r), lit(r.name))): _*)
    df.withColumn("__dq_reasons", reasons)
  }

  /** The report: one row per rule — (rule, violations, rows_checked,
    * pass). `pass` is violations == 0; the caller's gate is
    * `report.filter(!col("pass")).isEmpty` or a collect of the failed
    * names (rule-count-sized).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    val aggs = rules.zipWithIndex.map {
      case (u: Unique, i) =>
        (count(lit(1)) - count_distinct(struct(u.columns.map(col): _*)))
          .as(s"__v_$i")
      case (r, i) =>
        count(when(violation(r), lit(1))).as(s"__v_$i")
    }
    val withTotal = aggs :+ count(lit(1)).as("__total")
    val row = df.agg(withTotal.head, withTotal.tail: _*)
    row.select(explode(array(rules.zipWithIndex.map { case (r, i) =>
      struct(
        lit(r.name).as("rule"),
        col(s"__v_$i").as("violations"),
        col("__total").as("rows_checked"),
        (col(s"__v_$i") === 0L).as("pass"))
    }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("r.rows_checked").as("rows_checked"), col("r.pass").as("pass"))
  }
}
