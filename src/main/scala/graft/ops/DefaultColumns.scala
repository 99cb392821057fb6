package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** DEFAULT column values — `col TYPE DEFAULT <literal expr>`,
  * log-declared: an insert that OMITS the column lands the default; a
  * supplied value always wins (the SQL-standard DEFAULT contract —
  * unlike [[GeneratedColumns]], which owns its column). Default
  * expressions must be CONSTANT (no column references): the standard's
  * rule, and what makes fill a literal projection with no evaluation
  * order questions.
  *
  * Fill runs on the insert surfaces only (append / overwrite / SQL
  * INSERT with the column omitted / streaming append sink) — an
  * update-shaped write aligns against the full table schema by
  * construction and never has a missing column to default.
  *
  * `ALTER TABLE ADD COLUMNS` keeps REFUSING defaults: a default on an
  * added column would have to lie about pre-evolution rows (they read
  * NULL — rewriting history to the default is exactly the silent
  * corruption the versioned pins exist to prevent).
  */
object DefaultColumns {

  private val DeclName = "defaults.txt"

  /** Declare defaults (column → constant SQL expression). Overwrites
    * the declaration set. Constants only; a column cannot be both
    * generated and defaulted.
    */
  def declare(
      spark: SparkSession,
      dir: String,
      defaults: Seq[(String, String)]): Unit = {
    require(defaults.nonEmpty, "declare: no defaults")
    require(defaults.map(_._1).distinct.size == defaults.size,
      "declare: duplicate default")
    val gens = GeneratedColumns.generatedNames(spark, dir)
    defaults.foreach { case (n, e) =>
      require(!gens(n),
        s"default on $n: it is a generated column (exactly one of " +
          "DEFAULT / GENERATED ALWAYS AS per column)")
      val parsed = spark.sessionState.sqlParser.parseExpression(e)
      val refs = parsed.collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name
      }
      require(refs.isEmpty,
        s"default on $n: must be a constant expression, references " +
          s"${refs.mkString(", ")}")
      require(!e.contains('\t'), "default: literal tabs are not supported")
    }
    TxLog.metaWrite(spark, dir, DeclName,
      defaults.map { case (n, e) => s"$n\t$e" }.mkString("\n"))
  }

  def spec(spark: SparkSession, dir: String): Seq[(String, String)] =
    TxLog.metaRead(spark, dir, DeclName).toSeq.flatMap(_.linesIterator)
      .filter(_.nonEmpty).map { l =>
        val Array(n, e) = l.split('\t')
        (n, e)
      }

  private[graft] def defaultedNames(
      spark: SparkSession, dir: String): Set[String] =
    spec(spark, dir).map(_._1).toSet

  /** Rename/drop follow-through: DEFAULT declarations key on the
    * column name but reference no other column, so they can simply
    * FOLLOW a rename (and vanish on a drop).
    */
  private[graft] def renamed(
      spark: SparkSession, dir: String, from: String, to: String): Unit = {
    val cur = spec(spark, dir)
    if (cur.exists(_._1 == from))
      TxLog.metaWrite(spark, dir, DeclName, cur.map {
        case (`from`, e) => s"$to\t$e"
        case (n, e) => s"$n\t$e"
      }.mkString("\n"))
  }

  private[graft] def undeclare(
      spark: SparkSession, dir: String, names: Set[String]): Unit = {
    val kept = spec(spark, dir).filterNot { case (n, _) => names(n) }
    TxLog.metaWrite(spark, dir, DeclName,
      kept.map { case (n, e) => s"$n\t$e" }.mkString("\n"))
  }

  /** Add missing defaulted columns to an insert batch (supplied values
    * win; nothing validates). Cast to the pinned type when one exists.
    */
  private[graft] def fill(
      spark: SparkSession, dir: String, df: DataFrame): DataFrame = {
    val ds = spec(spark, dir)
    if (ds.isEmpty) return df
    val pin = TxLog.tableSchema(spark, dir)
    ds.foldLeft(df) { case (d, (n, e)) =>
      if (d.columns.contains(n)) d
      else {
        val v = pin.flatMap(_.fields.find(_.name == n))
          .map(f => expr(e).cast(f.dataType)).getOrElse(expr(e))
        d.withColumn(n, v)
      }
    }
  }
}
