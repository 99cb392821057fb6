package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets

/** HIDDEN PARTITIONING for [[TxLog]] tables — Iceberg's partition
  * transforms re-expressed over a hive layout: the table declares how
  * partition values DERIVE from data columns (`days(ts)`,
  * `months(ts)`, `bucket(n, key)`, `truncate(w, s)`), writers
  * materialize the derived columns automatically, and READERS NEVER
  * SEE THEM — a query filters on the DATA column (`ts BETWEEN …`,
  * `key IN (…)`) and the scan planner derives which partitions can
  * match, prunes the snapshot's entries by their path prefixes, and
  * applies the original predicate as the residual. The user-facing
  * contract plain hive partitioning cannot give: no
  * `WHERE p_day = '2024-01-05'` leaking layout into queries, no
  * silently-unpruned scan when the query forgets the partition
  * column.
  *
  * 100 TB shape: pruning is a driver-side string match over the
  * snapshot's ENTRY NAMES (metadata-sized — the log is the manifest;
  * no file listing, no footer reads), so a one-day query on a
  * years-deep events table opens only that day's files no matter how
  * the predicate is phrased. Bucket pruning turns a key-equality
  * request into O(|keys|) partitions via the same hash Spark's own
  * `hash()` computes. Entries are read through [[TxLog.readEntries]],
  * so time travel, per-partition compaction and deletion vectors all
  * compose with the pruning.
  *
  * Correctness discipline: the prune side never re-implements a
  * transform — partition values for literals are evaluated through
  * the SAME Catalyst expression the write side ran
  * ([[Transform.partitionValues]] runs a one-row local projection),
  * so a seed, timezone or integer-width mismatch between writer and
  * pruner cannot silently drop partitions. Range pruning is restricted
  * to the order-preserving transforms; `bucket` refuses ranges.
  *
  * The transform spec lives in the log dir (`partitioning.txt`) —
  * table metadata, exactly like stats columns and constraints.
  * Reference cited for behavior shape only: the reference warehouse
  * is unpartitioned single-node PostgreSQL (`docker-compose.yml:21`);
  * this is part of the scale surface the Spark re-expression adds.
  */
object PartitionTransforms {

  sealed trait Transform {
    def column: String

    /** The materialized partition column (reserved `p_` prefix). */
    def partCol: String

    /** Derivation expression — schema-aware (`truncate` branches on
      * the column's type), always cast to STRING so the hive dir
      * value and [[partitionValues]]' rendering agree byte-for-byte.
      */
    def expr(df: DataFrame): Column
    def serialized: String

    /** Whether data order implies partition-value order (range
      * pruning soundness).
      */
    def orderPreserving: Boolean

    /** Compare two PARTITION values in data order (only meaningful
      * when [[orderPreserving]]): day/month strings compare
      * lexicographically, numeric truncations numerically.
      */
    def lte(a: String, b: String): Boolean = a <= b
  }

  /** UTC calendar date of a TimestampType column — day boundaries
    * are fixed to UTC (Iceberg's definition) so a table written
    * under one `spark.sql.session.timeZone` and pruned under
    * another derives identical partition strings; `date_format`
    * alone renders in the session zone and would silently mis-prune
    * across a zone change. DateType/NTZ values have no zone to
    * begin with and take the plain branch.
    */
  private def utcDate(c: Column): Column =
    date_add(to_date(lit("1970-01-01")),
      floor(c.cast("double") / 86400d).cast("int"))

  final case class Days(column: String) extends Transform {
    val partCol = s"p_days_$column"
    def expr(df: DataFrame): Column = df.schema(column).dataType match {
      case TimestampType => date_format(utcDate(col(column)), "yyyy-MM-dd")
      case _ => date_format(col(column), "yyyy-MM-dd")
    }
    def serialized = s"days:$column"
    def orderPreserving = true
  }

  final case class Months(column: String) extends Transform {
    val partCol = s"p_months_$column"
    def expr(df: DataFrame): Column = df.schema(column).dataType match {
      case TimestampType => date_format(utcDate(col(column)), "yyyy-MM")
      case _ => date_format(col(column), "yyyy-MM")
    }
    def serialized = s"months:$column"
    def orderPreserving = true
  }

  /** Hash-bucket partitioning: `pmod(hash(col), n)` — Spark's own
    * Murmur3 `hash()`, codegen'd at write time and recomputed for
    * literals at prune time through the same expression.
    */
  final case class Bucket(n: Int, column: String) extends Transform {
    val partCol = s"p_bucket_$column"
    def expr(df: DataFrame): Column =
      pmod(hash(col(column)), lit(n)).cast("string")
    def serialized = s"bucket:$n:$column"
    def orderPreserving = false
  }

  /** Width-truncation: strings keep their first `w` chars
    * (lexicographic order preserved); integral values floor to
    * multiples of `w` (numeric order preserved — [[lte]] compares
    * numerically, since `"100" < "40"` would mis-prune).
    */
  final case class Truncate(w: Int, column: String) extends Transform {
    val partCol = s"p_trunc_$column"
    def expr(df: DataFrame): Column = df.schema(column).dataType match {
      case StringType => substring(col(column), 1, w)
      case LongType | IntegerType | ShortType | ByteType =>
        (floor(col(column).cast("long").divide(lit(w.toLong))) * w)
          .cast("long").cast("string")
      case other => throw new IllegalArgumentException(
        s"truncate($w, $column): unsupported type $other")
    }
    def serialized = s"truncate:$w:$column"
    def orderPreserving = true
    override def lte(a: String, b: String): Boolean =
      (a.toLongOption, b.toLongOption) match {
        case (Some(x), Some(y)) => x <= y
        case _ => a <= b
      }
  }

  /** Public parse of the serialized form (`days:ts`, `bucket:8:id`) —
    * the SQL procedure's argument format.
    */
  def parseTransform(s: String): Transform = parse(s)

  private def parse(s: String): Transform = s.split(':') match {
    case Array("days", c) => Days(c)
    case Array("months", c) => Months(c)
    case Array("bucket", n, c) => Bucket(n.toInt, c)
    case Array("truncate", w, c) => Truncate(w.toInt, c)
    case other => throw new IllegalArgumentException(
      s"unknown partition transform '$s'")
  }

  /** Partition values for literal data values, evaluated through the
    * transform's own expression in a one-row-per-value LOCAL
    * projection (no cluster job — a LocalRelation collapses to
    * driver-side evaluation).
    */
  private def partitionValues(
      spark: SparkSession,
      t: Transform,
      vs: Seq[Any],
      target: DataType): Seq[String] = {
    require(vs.nonEmpty, "no literal values to derive partitions from")
    val tpe = vs.head match {
      case _: java.lang.Long => LongType
      case _: java.lang.Integer => IntegerType
      case _: java.sql.Timestamp => TimestampType
      case _: java.time.Instant => TimestampType
      case _: java.sql.Date => DateType
      case _ => StringType
    }
    val data = new java.util.ArrayList[Row]()
    vs.foreach { v =>
      val cell = (tpe, v) match {
        case (TimestampType, i: java.time.Instant) =>
          java.sql.Timestamp.from(i)
        case (StringType, other) => other.toString
        case _ => v
      }
      data.add(Row(cell))
    }
    // cast literals to the TABLE column's type before the transform:
    // Murmur3 of an Int and of the same value as Long differ, so a
    // caller passing 32-bit keys against a BIGINT column would
    // otherwise prune every real partition away
    val raw = spark.createDataFrame(data,
      StructType(Seq(StructField(t.column, tpe))))
    val df = raw.withColumn(t.column, col(t.column).cast(target))
    df.select(t.expr(df).as("pv")).collect().map(_.getString(0)).toSeq
  }

  private val SpecName = "partitioning.txt"

  /** Create (or REPLACE — the dir is cleared) `dir` as a
    * hidden-partitioned logged table: materialize the derived
    * columns, write the hive tree, convert, persist the spec. Use
    * [[append]] for increments.
    */
  def write(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      transforms: Seq[Transform]): Unit = {
    require(transforms.nonEmpty, "at least one transform")
    require(transforms.map(_.partCol).distinct.size == transforms.size,
      "duplicate transform target")
    require(transforms.forall(t => df.columns.contains(t.column)),
      s"transform over a column the frame lacks: ${transforms.map(_.column)}")
    val fs = Compact.fsOf(spark, dir)
    fs.delete(new Path(dir), true)
    derived(df, transforms)
      .write.partitionBy(transforms.map(_.partCol): _*).parquet(dir)
    TxLog.convert(spark, dir)
    val out = fs.create(new Path(new Path(dir, "_txlog"), SpecName), true)
    try out.write(transforms.map(_.serialized).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def spec(spark: SparkSession, dir: String): Seq[Transform] = {
    val fs = Compact.fsOf(spark, dir)
    val p = new Path(new Path(dir, "_txlog"), SpecName)
    require(fs.exists(p), s"$dir carries no partition-transform spec")
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    lines.filter(_.nonEmpty).map(parse)
  }

  private val SpecHistoryName = "partitioning.history.txt"

  /** Partition-spec EVOLUTION (Iceberg's flagship metadata-only
    * economics): switch the table to `transforms` for all FUTURE
    * batches — existing files keep their layout untouched, scans
    * prune each era by its own transform, nothing rewrites. The old
    * spec moves to a history file the pruner consults alongside the
    * current one.
    *
    * Bound, stated honestly: an evolution whose new partition-column
    * NAME collides with a historical one under a DIFFERENT transform
    * (`bucket(8, c)` → `bucket(16, c)` — both derive `p_bucket_c`)
    * refuses, because entry names alone cannot tell which era wrote a
    * file; changing a transform's parameters needs a rewrite through
    * [[write]]. Changing the transform KIND (days → months,
    * days → bucket) is the common evolution and is metadata-only.
    */
  def evolve(
      spark: SparkSession,
      dir: String,
      transforms: Seq[Transform]): Unit = {
    require(transforms.nonEmpty, "at least one transform")
    require(transforms.map(_.partCol).distinct.size == transforms.size,
      "duplicate transform target")
    val prior = allSpecs(spark, dir)
    val newBySer = transforms.map(_.serialized).toSet
    val clash = prior.filter(t =>
      transforms.exists(n => n.partCol == t.partCol) &&
        !newBySer.contains(t.serialized))
    require(clash.isEmpty,
      s"evolve: ${clash.map(_.serialized).mkString(", ")} already derived " +
        s"partition column(s) ${clash.map(_.partCol).mkString(", ")} under a " +
        "different transform — entry names cannot tell the eras apart; " +
        "rewrite via PartitionTransforms.write to change parameters")
    val fs = Compact.fsOf(spark, dir)
    val hist = (prior.map(_.serialized) ++ spec(spark, dir).map(_.serialized))
      .distinct
    val hout = fs.create(new Path(new Path(dir, "_txlog"), SpecHistoryName), true)
    try hout.write(hist.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally hout.close()
    val out = fs.create(new Path(new Path(dir, "_txlog"), SpecName), true)
    try out.write(transforms.map(_.serialized).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Every transform any era declared (current spec last), deduped —
    * what the pruner and the column-drop consult.
    */
  def allSpecs(spark: SparkSession, dir: String): Seq[Transform] = {
    val fs = Compact.fsOf(spark, dir)
    val p = new Path(new Path(dir, "_txlog"), SpecHistoryName)
    val hist =
      if (!fs.exists(p)) Nil
      else {
        val in = fs.open(p)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        lines.filter(_.nonEmpty).map(parse)
      }
    (hist ++ spec(spark, dir))
      .groupBy(_.serialized).map(_._2.head).toSeq.sortBy(_.serialized)
  }

  /** An entry's layout signature: the partition-column names its path
    * encodes — which era wrote it. Mixed-era tables must scan era by
    * era: Spark's partition inference refuses one read over
    * conflicting hive layouts.
    */
  private def sigOf(name: String): Set[String] =
    name.split('/').dropRight(1).toSeq
      .filter(_.contains('=')).map(_.takeWhile(_ != '=')).toSet

  private def derived(df: DataFrame, ts: Seq[Transform]): DataFrame =
    ts.foldLeft(df)((d, t) => d.withColumn(t.partCol, t.expr(d)))

  /** Append a batch: derive the partition columns from the saved spec
    * and land the partition tree in ONE commit (adds only — the
    * staged-tree move [[Compact.stageRewriteHive]] already speaks).
    */
  def append(spark: SparkSession, df: DataFrame, dir: String): Int = {
    val ts = spec(spark, dir)
    Compact.stageRewriteHive(spark, dir, olds = Nil, writeStage = p =>
      derived(df, ts).write
        .partitionBy(ts.map(_.partCol): _*).mode("overwrite").parquet(p))
    TxLog.currentVersion(spark, dir)
  }

  /** The table WITHOUT its materialized partition columns — what a
    * reader who never heard of the layout sees. Era-aware: a table
    * that evolved its spec scans each era's files under that era's
    * layout and unions (the data schema is identical once the derived
    * columns drop).
    */
  def scan(spark: SparkSession, dir: String): DataFrame =
    eraScans(spark, dir, TxLog.liveEntries(spark, dir))
      .reduce(_.unionByName(_))

  /** One dropped-partition-column DataFrame per layout era, in a
    * deterministic order. Single-era tables (the common case) return
    * exactly the one scan the pre-evolution code built — no union in
    * the plan.
    */
  private def eraScans(
      spark: SparkSession,
      dir: String,
      entries: Seq[graft.ops.TxLog.AddEntry]): Seq[DataFrame] = {
    require(entries.nonEmpty, s"$dir holds no files")
    val dropCols = allSpecs(spark, dir).map(_.partCol).distinct
    entries.groupBy(e => sigOf(e.name)).toSeq
      .sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (_, es) =>
        TxLog.readEntries(spark, dir, es).drop(dropCols: _*)
      }
  }

  /** Scan with `column` = any of `values`: the matching partitions
    * derive from the transform over `column`, every other entry is
    * pruned driver-side, and the ORIGINAL equality predicate rides
    * the surviving scans as the residual. No transform over `column`
    * → full scan with the residual (correct, unpruned — the same
    * degradation contract as every stats miss).
    */
  def scanEquals(
      spark: SparkSession,
      dir: String,
      column: String,
      values: Seq[Any]): DataFrame = {
    val residual = (d: DataFrame) => d.filter(col(column).isin(values: _*))
    prune(spark, dir, column, residual) { (t, dt) =>
      val admit = partitionValues(spark, t, values, dt).toSet
      pv => admit(pv)
    }
  }

  /** Scan with `lo` ≤ `column` ≤ `hi` — order-preserving transforms
    * only (`bucket` refuses: a hash scatters the range over every
    * bucket). The bounds' own partition values bracket the admissible
    * partitions because the transform is monotone.
    */
  def scanRange(
      spark: SparkSession,
      dir: String,
      column: String,
      lo: Any,
      hi: Any): DataFrame = {
    val over = allSpecs(spark, dir).filter(_.column == column)
    require(over.isEmpty || over.exists(_.orderPreserving),
      s"${over.map(_.serialized).mkString(", ")} cannot prune a range " +
        "predicate — use scanEquals or scan+filter")
    val residual = (d: DataFrame) =>
      d.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
    prune(spark, dir, column, residual) { (t, dt) =>
      // a non-order-preserving ERA (a historical bucket spec the
      // table evolved away from) can't range-prune: its files pass
      // unpruned, the residual keeps them correct
      if (!t.orderPreserving) _ => true
      else {
        val Seq(plo, phi) = partitionValues(spark, t, Seq(lo, hi), dt)
        pv => t.lte(plo, pv) && t.lte(pv, phi)
      }
    }
  }

  /** Prune receipt for guards and tests: (files admitted, files
    * total) for an equality request.
    */
  def pruneCountEquals(
      spark: SparkSession,
      dir: String,
      column: String,
      values: Seq[Any]): (Int, Int) = {
    val ts = allSpecs(spark, dir).filter(_.column == column)
    val entries = TxLog.liveEntries(spark, dir)
    if (ts.isEmpty) return (entries.size, entries.size)
    val dt = TxLog.readEntries(spark, dir, Seq(entries.head))
      .schema(column).dataType
    val kept = ts.foldLeft(entries) { (acc, t) =>
      val admit = partitionValues(spark, t, values, dt).toSet
      acc.filter(e => admitsEntry(t, e.name, admit))
    }
    (kept.size, entries.size)
  }

  private def admitsEntry(
      t: Transform, name: String, admit: String => Boolean): Boolean = {
    val prefix = s"${t.partCol}="
    name.split('/').find(_.startsWith(prefix)) match {
      // hive encodes the value after `=`; our derived values never
      // need escaping (dates, ints, short ascii prefixes)
      case Some(seg) => admit(seg.substring(prefix.length))
      case None => true // unpartitioned stray: never wrongly prune
    }
  }

  private def prune(
      spark: SparkSession,
      dir: String,
      column: String,
      residual: DataFrame => DataFrame)(
      admitOf: (Transform, DataType) => String => Boolean): DataFrame = {
    val ts = allSpecs(spark, dir).filter(_.column == column)
    val entries = TxLog.liveEntries(spark, dir)
    require(entries.nonEmpty, s"$dir holds no files")
    val dropCols = allSpecs(spark, dir).map(_.partCol).distinct
    def dropPart(d: DataFrame) = d.drop(dropCols: _*)
    if (ts.isEmpty)
      return residual(eraScans(spark, dir, entries).reduce(_.unionByName(_)))
    // each entry prunes under ITS OWN era's transform: a check against
    // another era's transform passes trivially (the prefix is absent
    // from the name), so the fold composes across evolutions
    val dt = TxLog.readEntries(spark, dir, Seq(entries.head))
      .schema(column).dataType
    val kept = ts.foldLeft(entries) { (acc, t) =>
      val admit = admitOf(t, dt)
      acc.filter(e => admitsEntry(t, e.name, admit))
    }
    if (kept.isEmpty)
      residual(dropPart(
        TxLog.readEntries(spark, dir, Seq(entries.head))).limit(0))
    else residual(eraScans(spark, dir, kept).reduce(_.unionByName(_)))
  }
}
