package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.RollupStore
import graft.sources.ParquetStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class RollupFact(l_partkey: Long, l_quantity: Double)
case class SketchFact(flag: String, supp: Long, qty: Double)

class RollupIngestSpec extends SparkSpec {

  private def newStore() =
    new ParquetStore(spark, Files.createTempDirectory("graft_rollupingest").toString)

  private val keys = Seq("l_partkey")
  private val ms = Seq("l_quantity")

  test("streamed epochs converge to the one-shot aggregate; an epoch replay folds nothing twice") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val li = graft.Tables.lineitem(spark, sf("lineitem"))
      .select(col("l_partkey"), col("l_quantity"))
    val facts = li.collect().map(r => RollupFact(r.getLong(0), r.getDouble(1))).toSeq
    val (e0, e1) = facts.splitAt(facts.length / 2)

    val store = newStore()
    val sink = RollupIngest.rollupSink(store, "r", keys, ms, nShards = 8)
    val src = MemoryStream[RollupFact]
    val q = src.toDF().writeStream.foreachBatch(sink).start()
    src.addData(e0)
    q.processAllAvailable()
    src.addData(e1)
    q.processAllAvailable()
    q.stop()

    // failure-recovery shape: the LAST epoch is re-delivered with its
    // own batchId — the epoch stamp, not content, must catch it
    val replayed = RollupStore.ingest(store, "r", e1.toDF(), keys, ms,
      batchId = Some("epoch_1"))
    assert(replayed == -1L)

    val got = RollupStore.finalize(store, "r", ms)
      .collect().map(r => r.getAs[Long]("l_partkey") ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_l_quantity"))).toMap
    val exact = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === exact)
  }

  test("sketch state families survive the real stream: topk + quantile through MemoryStream epochs") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val li = graft.Tables.lineitem(spark, sf("lineitem"))
      .select(col("l_returnflag"), col("l_suppkey"), col("l_quantity"))
    val facts = li.collect()
      .map(r => SketchFact(r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val (e0, e1) = facts.splitAt(facts.length / 2)

    val store = newStore()
    val sink = RollupIngest.rollupSink(store, "sk", Seq("flag"), Seq("qty"),
      nShards = 4, topkMeasures = Seq("supp"), topkK = 4096,
      quantileMeasures = Seq("qty"))
    val src = MemoryStream[SketchFact]
    val q = src.toDF().writeStream.foreachBatch(sink).start()
    src.addData(e0)
    q.processAllAvailable()
    src.addData(e1)
    q.processAllAvailable()
    q.stop()

    val fin = RollupStore.finalize(store, "sk", Seq("qty"),
      topkMeasures = Seq("supp"), topJ = 3,
      quantileMeasures = Seq("qty"), quantiles = Seq(0.5))
    val got = fin.collect().map { r =>
      r.getAs[String]("flag") -> ((
        r.getAs[scala.collection.Seq[String]]("topk_keys_supp").toSeq,
        r.getAs[scala.collection.Seq[Long]]("topk_counts_supp").toSeq,
        r.getAs[Double]("p50_qty")))
    }.toMap

    // exact expectations: top-3 suppliers (count desc, key-string asc)
    // and rank-ceil(N/2) quantity per flag
    val exact = li.collect().groupBy(_.getString(0)).map { case (f, rows) =>
      val top = rows.groupBy(_.getLong(1)).view
        .mapValues(_.length.toLong).toSeq
        .sortBy { case (k, c) => (-c, k.toString) }.take(3)
      val qs = rows.map(_.getDouble(2)).sorted
      f -> ((top.map(_._1.toString), top.map(_._2),
        qs((math.ceil(qs.length / 2.0) - 1).toInt)))
    }
    assert(got.keySet == exact.keySet)
    exact.foreach { case (f, (tk, tc, p50)) =>
      assert(got(f)._1 == tk, s"$f topk keys: ${got(f)._1} vs $tk")
      assert(got(f)._2 == tc, s"$f topk counts")
      assert(got(f)._3 == p50, s"$f p50: ${got(f)._3} vs $p50")
    }
  }

  test("two epochs with identical content both fold — epoch ids beat content keys") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val batch = Seq(RollupFact(1L, 2.0), RollupFact(1L, 3.0), RollupFact(2L, 5.0))
    val store = newStore()
    val src = MemoryStream[RollupFact]
    val q = src.toDF().writeStream
      .foreachBatch(RollupIngest.rollupSink(store, "r", keys, ms, nShards = 4))
      .start()
    src.addData(batch)
    q.processAllAvailable()
    src.addData(batch) // a genuinely new epoch, same rows
    q.processAllAvailable()
    q.stop()
    val got = RollupStore.finalize(store, "r", ms)
      .collect().map(r => r.getAs[Long]("l_partkey") ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_l_quantity"))).toMap
    assert(got === Map(1L -> ((4L, 10.0)), 2L -> ((2L, 10.0))))
  }
}
