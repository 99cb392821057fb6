package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, not}

/** GENERATED COLUMNS — `GENERATED ALWAYS AS (expr)`, log-declared:
  * the table carries named SQL expressions over its other columns;
  * every insert surface computes them when the batch omits the
  * column, and VALIDATES them (null-safe equality) when the batch
  * supplies one — an explicit wrong value is an error, not silent
  * drift (Delta's generated-column contract). Update-shaped writes
  * (MOR upsert, SQL MERGE images) RECOMPUTE instead: an update that
  * changes a source column must move the generated value with it, and
  * clause-built images are exactly where stale values arise.
  *
  * The flagship composition is a generated PARTITION column: declare
  * `event_date DATE GENERATED ALWAYS AS (CAST(ts AS DATE))` and
  * `PARTITIONED BY (event_date)` — appends compute the value before
  * the partition tree is staged, so the layout is derived, never
  * caller-supplied. (Derived-predicate pruning on the SOURCE column
  * is [[PartitionTransforms]]' job; the two compose.)
  *
  * Scope guards live on the schema-change paths: a column a
  * generation expression references refuses to rename, drop, or
  * type-widen (the stored SQL names it); the generated column itself
  * refuses to rename (it keys the declaration).
  *
  * 100 TB shape: fill is a projection over the BATCH (codegen'd
  * expression, zero shuffle); validation is one `filter(NOT
  * …).limit(1)` probe per declared column over the delta only — the
  * CHECK-constraint cost model.
  */
object GeneratedColumns {

  private val DeclName = "gencols.txt"

  final class GeneratedColumnViolation(msg: String)
      extends IllegalArgumentException(msg)

  /** Declare generated columns (name → SQL expression over the other
    * columns). Overwrites the full declaration set. Expressions must
    * not reference generated columns (including themselves).
    */
  def declare(
      spark: SparkSession,
      dir: String,
      gens: Seq[(String, String)]): Unit = {
    require(gens.nonEmpty, "declare: no generated columns")
    require(gens.map(_._1).distinct.size == gens.size,
      "declare: duplicate generated column")
    val names = gens.map(_._1).toSet
    gens.foreach { case (n, e) =>
      // parse now: a typo should fail the declaration, not every write
      val parsed = spark.sessionState.sqlParser.parseExpression(e)
      val refs = parsed.collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name
      }
      refs.find(names).foreach(r => throw new IllegalArgumentException(
        s"generated column $n: expression references generated column $r " +
          "(chains are not supported — inline the expression)"))
      require(refs.nonEmpty,
        s"generated column $n: expression references no column ($e)")
    }
    TxLog.metaWrite(spark, dir, DeclName,
      gens.map { case (n, e) => s"$n\t$e" }.mkString("\n"))
  }

  /** Remove declarations for dropped columns (DROP COLUMN cascades —
    * a stale declaration would re-fill the column on the next insert,
    * resurrecting it).
    */
  private[graft] def undeclare(
      spark: SparkSession, dir: String, names: Set[String]): Unit = {
    val kept = spec(spark, dir).filterNot { case (n, _) => names(n) }
    if (kept.isEmpty)
      TxLog.metaWrite(spark, dir, DeclName, "")
    else TxLog.metaWrite(spark, dir, DeclName,
      kept.map { case (n, e) => s"$n\t$e" }.mkString("\n"))
  }

  /** The declared (column, expression) pairs, declaration order. */
  def spec(spark: SparkSession, dir: String): Seq[(String, String)] =
    TxLog.metaRead(spark, dir, DeclName).toSeq.flatMap(_.linesIterator)
      .filter(_.nonEmpty).map { l =>
        val Array(n, e) = l.split('\t')
        (n, e)
      }

  /** Columns any generation expression REFERENCES — what the
    * schema-change guards consult.
    */
  private[graft] def referencedColumns(
      spark: SparkSession, dir: String): Set[String] =
    spec(spark, dir).flatMap { case (_, e) =>
      spark.sessionState.sqlParser.parseExpression(e).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name
      }
    }.toSet

  private[graft] def generatedNames(
      spark: SparkSession, dir: String): Set[String] =
    spec(spark, dir).map(_._1).toSet

  /** Compute missing generated columns; validate or recompute supplied
    * ones. `recompute = true` is the update-shaped contract (MOR
    * upsert, MERGE images): supplied values are REPLACED by the
    * expression so a changed source column moves its derived value.
    * `recompute = false` is the insert contract: a supplied value must
    * EQUAL the expression (null-safe) or the write refuses. The pinned
    * type, when one exists, is cast onto the computed value so the
    * staged files agree with the table schema.
    */
  private[graft] def fill(
      spark: SparkSession,
      dir: String,
      df: DataFrame,
      recompute: Boolean = false): DataFrame = {
    val gens = spec(spark, dir)
    if (gens.isEmpty) return df
    val pin = TxLog.tableSchema(spark, dir)
    def typed(n: String, e: org.apache.spark.sql.Column) =
      pin.flatMap(_.fields.find(_.name == n)).map(f => e.cast(f.dataType))
        .getOrElse(e)
    gens.foldLeft(df) { case (d, (n, e)) =>
      if (!d.columns.contains(n)) d.withColumn(n, typed(n, expr(e)))
      else if (recompute) d.withColumn(n, typed(n, expr(e)))
      else {
        val bad = d.filter(not(col(n) <=> typed(n, expr(e)))).limit(1).count()
        if (bad > 0)
          throw new GeneratedColumnViolation(
            s"generated column $n: an inserted row's explicit value " +
              s"differs from GENERATED ALWAYS AS ($e); omit the column " +
              "or supply the computed value")
        d
      }
    }
  }
}
