package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based random-op test over the WHOLE round-14 schema-evolution
  * family on one table: rename / add / drop / type-widen interleaved
  * with appends, keyed MOR upserts, predicate deletes, compactions and
  * RESTOREs — after every operation the engine snapshot must equal a
  * driver-side model (columns, types, row multiset), and a random
  * retained version must time-travel to the model's HISTORY at that
  * version (each version under its own names, width and types). The
  * composition surface is where schema-evolution bugs live; a scripted
  * spec can't reach the interleavings a seeded random walk does.
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

  private def walk(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory("evomodel").toString + "/t"

    // seed: key k (INT — widen is an op), tag STRING, amt DOUBLE
    var nextKey = 1000
    def freshRows(n: Int, cols: Seq[(String, DataType)],
        keyName: String): Seq[Map[String, Any]] =
      (0 until n).map { _ =>
        nextKey += 1
        cols.map { case (c, t) =>
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

    var keyName = "k"
    var model = Model(
      Seq("k" -> IntegerType, "tag" -> StringType, "amt" -> DoubleType),
      Nil)
    model = model.copy(rows = freshRows(30, model.cols, keyName))
    model.toDf(spark).repartition(3).write.parquet(dir)
    TxLog.convert(spark, dir)
    TxLog.setTableSchema(spark, dir, model.schema, 0)

    // engine-version → model-state history (for restore + time travel)
    var history = Map(TxLog.currentVersion(spark, dir) -> model)
    var addSerial = 0

    def check(): Unit = {
      val got = TxLog.snapshot(spark, dir)
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        model.cols, s"schema drift: ${got.schema} vs ${model.cols}")
      val exp = model.toDf(spark)
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        s"rows drift at v${TxLog.currentVersion(spark, dir)}")
    }

    (1 to 20).foreach { step =>
      val nonKey = model.cols.map(_._1).filterNot(_ == keyName)
      rnd.nextInt(9) match {
        case 0 => // RENAME a random column (key included — track it)
          val from = model.cols(rnd.nextInt(model.cols.size))._1
          val to = s"${from.takeWhile(_ != '_')}_r$step"
          ColumnMapping.renameColumn(spark, dir, from, to)
          if (from == keyName) keyName = to
          model = Model(
            model.cols.map { case (n, t) => (if (n == from) to else n, t) },
            model.rows.map(r => r.map { case (n, v) =>
              (if (n == from) to else n, v) }))
        case 1 => // ADD a nullable column (fresh physical under mapping)
          addSerial += 1
          val n = s"extra_$addSerial"
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
          val batch = freshRows(5 + rnd.nextInt(5), model.cols, keyName)
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
          val inserted = freshRows(2, model.cols, keyName)
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
            // whose values are the key domain (ints/longs > 1000)
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
      if (rnd.nextInt(3) == 0) {
        val vs = history.keys.toSeq.sorted
        val v = vs(rnd.nextInt(vs.size))
        val then0 = history(v)
        val got = TxLog.snapshot(spark, dir, v)
        assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
          then0.cols, s"time travel to v$v: schema drift")
        val exp = then0.toDf(spark)
        assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
          s"time travel to v$v: rows drift")
      }
    }
  }

  test("20 random schema+data ops: snapshot == model at every step, " +
      "history time-travels under its own schemas (seed 4242)") {
    walk(4242)
  }

  test("a second walk hits a different interleaving (seed 777)") {
    walk(777)
  }
}
