package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based random-op test over the WHOLE round-14 schema-evolution
  * family: rename / add / drop / type-widen interleaved with appends,
  * keyed MOR upserts, predicate deletes, compactions and RESTOREs —
  * after every operation the engine snapshot must equal a driver-side
  * model (columns, types, row multiset), and a random retained version
  * must time-travel to the model's HISTORY at that version (each
  * version under its own names, width and types). The composition
  * surface is where schema-evolution bugs live; a scripted spec can't
  * reach the interleavings a seeded random walk does.
  *
  * The CLONE-PAIR walk (round 16) runs the same op set over a shallow
  * clone and its source SIMULTANEOUSLY with independent models:
  * renames/widens/drops on either side must never leak into the other,
  * and RESTORE works across a rename on the clone.
  */
class SchemaEvolutionModelSpec extends SparkSpec {

  // the driver-side model: column list (name, type) + rows as ordered
  // value maps keyed by logical column name
  private case class Model(cols: Seq[(String, DataType)],
      rows: Seq[Map[String, Any]]) {
    def schema: StructType =
      StructType(cols.map { case (n, t) => StructField(n, t) })
    def toDf(spark: org.apache.spark.sql.SparkSession) =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r =>
          Row(cols.map { case (n, _) => r(n) }: _*)): _*), schema)
  }

  private def norm(v: Any, t: DataType): Any = (v, t) match {
    case (i: Int, LongType) => i.toLong
    case (f: Float, DoubleType) => f.toDouble
    case other => other._1
  }

  /** One table's random-walk state: the engine dir, the model, the
    * version→model history, and the op step — instantiable twice for
    * the clone-pair walk.
    */
  private class Walker(val dir: String, rnd: scala.util.Random,
      keyBase: Int) {
    private var nextKey = keyBase
    private var addSerial = 0
    var keyName = "k"
    var model: Model = Model(
      Seq("k" -> IntegerType, "tag" -> StringType, "amt" -> DoubleType),
      Nil)
    var history: Map[Int, Model] = Map.empty

    def freshRows(n: Int): Seq[Map[String, Any]] =
      (0 until n).map { _ =>
        nextKey += 1
        model.cols.map { case (c, t) =>
          // expected type Any: Scala's weak-lub would otherwise widen
          // the mixed Int/Long branches to Long and break the Int rows
          val v: Any =
            if (c == keyName) t match {
              case LongType => nextKey.toLong
              case _ => nextKey
            }
            else t match {
              case StringType => s"v$nextKey"
              case DoubleType => nextKey * 1.5
              case IntegerType => nextKey % 97
              case LongType => (nextKey % 97).toLong
              case _ => null
            }
          c -> v
        }.toMap
      }

    def seed(): Unit = {
      model = model.copy(rows = freshRows(30))
      model.toDf(spark).repartition(3).write.parquet(dir)
      TxLog.convert(spark, dir)
      TxLog.setTableSchema(spark, dir, model.schema, 0)
      history = Map(TxLog.currentVersion(spark, dir) -> model)
    }

    /** Adopt another walker's state as a fresh CLONE of it (the clone
      * starts at v0 carrying the source's current model).
      */
    def adoptClone(src: Walker): Unit = {
      model = src.model
      keyName = src.keyName
      history = Map(TxLog.currentVersion(spark, dir) -> model)
    }

    def check(): Unit = {
      val got = TxLog.snapshot(spark, dir)
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        model.cols, s"schema drift in $dir: ${got.schema} vs ${model.cols}")
      val exp = model.toDf(spark)
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        s"rows drift in $dir at v${TxLog.currentVersion(spark, dir)}")
    }

    def timeTravelProbe(): Unit = {
      val vs = history.keys.toSeq.sorted
      val v = vs(rnd.nextInt(vs.size))
      val then0 = history(v)
      val got = TxLog.snapshot(spark, dir, v)
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        then0.cols, s"time travel to v$v of $dir: schema drift")
      val exp = then0.toDf(spark)
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        s"time travel to v$v of $dir: rows drift")
    }

    def step(stepNo: Int): Unit = {
      val nonKey = model.cols.map(_._1).filterNot(_ == keyName)
      rnd.nextInt(9) match {
        case 0 => // RENAME a random column (key included — track it)
          val from = model.cols(rnd.nextInt(model.cols.size))._1
          val to = s"${from.takeWhile(_ != '_')}_r$stepNo"
          ColumnMapping.renameColumn(spark, dir, from, to)
          if (from == keyName) keyName = to
          model = Model(
            model.cols.map { case (n, t) => (if (n == from) to else n, t) },
            model.rows.map(r => r.map { case (n, v) =>
              (if (n == from) to else n, v) }))
        case 1 => // ADD a nullable column (fresh physical under mapping)
          addSerial += 1
          val n = s"extra_${keyBase}_$addSerial"
          ColumnMapping.addColumn(spark, dir,
            StructField(n, StringType, nullable = true))
          model = Model(model.cols :+ (n -> StringType),
            model.rows.map(_ + (n -> null)))
        case 2 if nonKey.size > 1 => // DROP a non-key column
          val n = nonKey(rnd.nextInt(nonKey.size))
          ColumnMapping.dropColumn(spark, dir, n)
          model = Model(model.cols.filterNot(_._1 == n),
            model.rows.map(_ - n))
        case 3 if model.cols.exists(_._2 == IntegerType) => // WIDEN int→long
          val n = model.cols.find(_._2 == IntegerType).get._1
          graft.plans.GraftDml.sql(spark,
            s"ALTER TABLE parquet.`$dir` ALTER COLUMN $n TYPE BIGINT")
          model = Model(
            model.cols.map { case (c, t) =>
              (c, if (c == n) LongType else t) },
            model.rows.map(r => r + (n -> norm(r(n), LongType))))
        case 4 => // APPEND a fresh batch
          val batch = freshRows(5 + rnd.nextInt(5))
          val m2 = Model(model.cols, batch)
          TxLog.append(spark, dir, m2.toDf(spark))
          model = Model(model.cols, model.rows ++ batch)
        case 5 if model.rows.nonEmpty => // keyed MOR upsert (replace + insert)
          val existing = model.rows.map(_(keyName))
          val hitKeys = rnd.shuffle(existing)
            .take(1 + rnd.nextInt(math.min(5, existing.size))).toSet
          val updated = model.rows.filter(r => hitKeys(r(keyName))).map(r =>
            r.map { case (n, v) =>
              n -> (if (n == keyName) v
              else if (model.cols.find(_._1 == n).get._2 == DoubleType)
                v.asInstanceOf[Double] + 1000.0
              else v)
            })
          val inserted = freshRows(2)
          val batch = Model(model.cols, updated ++ inserted)
          DeletionVectors.upsert(spark, dir, batch.toDf(spark),
            keyCols = Seq(keyName))
          model = Model(model.cols,
            model.rows.filterNot(r => hitKeys(r(keyName))) ++
              updated ++ inserted)
        case 6 if model.rows.nonEmpty => // predicate delete through SQL
          val m = 3 + rnd.nextInt(4)
          def keyLong(r: Map[String, Any]): Long = r(keyName) match {
            case i: Int => i.toLong
            case l: Long => l
          }
          graft.plans.GraftDml.sql(spark,
            s"DELETE FROM parquet.`$dir` WHERE $keyName % $m = 0")
          model = Model(model.cols,
            model.rows.filterNot(r => keyLong(r) % m == 0))
        case 7 if history.size > 1 => // RESTORE to a random retained version
          val vs = history.keys.toSeq.sorted
          val target = vs(rnd.nextInt(vs.size - 1)) // strictly older
          TxLog.restore(spark, dir, target)
          val restored = history(target)
          model = restored
          keyName = // the key column's name AT that version: the one
            // whose values are the key domain (ints/longs > keyBase)
            restored.cols.find(c => c._2 == IntegerType ||
              c._2 == LongType).map(_._1).getOrElse(keyName)
        case _ => // compact (no semantic change)
          Compact.binPack(spark, dir, targetBytes = 1L << 30,
            smallBytes = 1L << 30)
      }
      check()
      history += TxLog.currentVersion(spark, dir) -> model
      // time-travel probe: a random retained HISTORY version must read
      // under ITS schema and rows (names, width, types of that era)
      if (rnd.nextInt(3) == 0) timeTravelProbe()
    }
  }

  private def walk(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val w = new Walker(
      Files.createTempDirectory("evomodel").toString + "/t", rnd, 1000)
    w.seed()
    (1 to 20).foreach(w.step)
  }

  test("20 random schema+data ops: snapshot == model at every step, " +
      "history time-travels under its own schemas (seed 4242)") {
    walk(4242)
  }

  test("a second walk hits a different interleaving (seed 777)") {
    walk(777)
  }

  test("clone-pair walk: random schema+data ops on a shallow clone and " +
      "its source never leak across; RESTORE works across renames (seed 90210)") {
    val rnd = new scala.util.Random(90210)
    val src = new Walker(
      Files.createTempDirectory("evoclone").toString + "/t", rnd, 1000)
    src.seed()
    (1 to 6).foreach(src.step)
    // shallow-clone the evolved source; the clone adopts its model
    val clone = new Walker(
      Files.createTempDirectory("evoclone").toString + "/c", rnd, 500000)
    TxLog.cloneTo(spark, src.dir, clone.dir)
    clone.adoptClone(src)
    clone.check() // the clone reads the source's state verbatim
    // interleave 14 ops across the pair; after EVERY op, BOTH tables
    // must match their own models — a rename/widen/drop leaking
    // through the shared bytes would surface immediately
    (7 to 20).foreach { i =>
      val w = if (rnd.nextBoolean()) src else clone
      w.step(i)
      src.check()
      clone.check()
    }
    // deterministic epilogue: a rename on the CLONE, a RESTORE across
    // it, and the source byte-state untouched throughout
    val srcSchemaBefore = TxLog.snapshot(spark, src.dir).schema
    val preRenameV = TxLog.currentVersion(spark, clone.dir)
    val someCol = clone.model.cols.map(_._1)
      .find(_ != clone.keyName).get
    ColumnMapping.renameColumn(spark, clone.dir, someCol, "epilogue_r")
    assert(TxLog.snapshot(spark, clone.dir).columns.contains("epilogue_r"))
    assert(TxLog.snapshot(spark, src.dir).schema == srcSchemaBefore,
      "clone rename leaked into the source schema")
    TxLog.restore(spark, clone.dir, preRenameV)
    assert(!TxLog.snapshot(spark, clone.dir).columns.contains("epilogue_r"))
    clone.check() // restore across the rename: pre-rename names + rows
    src.check()
  }
}
