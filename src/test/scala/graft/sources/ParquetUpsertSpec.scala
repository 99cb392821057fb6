package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParquetUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("mergeByKey: replaces matched keys, appends new, idempotent") {
    val dir = Files.createTempDirectory("graft_upsert").toString + "/t"
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    assert(ParquetUpsert.mergeByKey(spark, dir, v1, Seq("id")) == 2L)

    // update id=2, insert id=3
    val v2 = Seq((2L, "b2", 21.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    assert(ParquetUpsert.mergeByKey(spark, dir, v2, Seq("id")) == 3L)
    val out = spark.read.parquet(dir).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(1).getString(1) == "b2" && out(1).getDouble(2) == 21.0)

    // re-applying the same updates changes nothing
    assert(ParquetUpsert.mergeByKey(spark, dir, v2, Seq("id")) == 3L)
    assert(spark.read.parquet(dir).count() == 3L)
    // no stage/old leftovers
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(parent == Seq("t"), s"leftovers: $parent")
  }

  test("staged partitioned append: accumulates batches, partition layout, no leftovers") {
    val wh = Files.createTempDirectory("graft_store").toString
    val store = new ParquetStore(spark, wh)
    val b1 = Seq((1L, 202001, 1.0), (2L, 202002, 2.0)).toDF("id", "p_month", "v")
    store.appendPartitioned(b1, "fact", "p_month")
    val b2 = Seq((3L, 202001, 3.0)).toDF("id", "p_month", "v")
    // simulate a stale stage from a killed run — must be clobbered
    val stale = new java.io.File(s"$wh/fact__fact_stage"); stale.mkdirs()
    Files.writeString(java.nio.file.Path.of(stale.toString, "junk"), "x")
    store.appendPartitioned(b2, "fact", "p_month")
    val back = store.read("fact")
    assert(back.count() == 3)
    assert(back.filter(col("p_month") === 202001).count() == 2)
    // physical layout: hive-style partition dirs, no stage dir left
    val top = new java.io.File(s"$wh/fact").list().toSeq.filterNot(_.startsWith("_"))
    assert(top.toSet == Set("p_month=202001", "p_month=202002"), top.toString)
    assert(new java.io.File(wh).list().toSeq.filterNot(_.startsWith("_")) == Seq("fact"))
  }

  test("crash recovery: stale __stage/__old dirs from a killed run are ignored and cleaned") {
    val dir = Files.createTempDirectory("graft_upsert_crash").toString + "/t"
    val v1 = Seq((1L, "a", 10.0)).toDF("id", "name", "v")
    ParquetUpsert.mergeByKey(spark, dir, v1, Seq("id"))

    // simulate a run killed mid-stage-write / mid-publish
    val stage = new java.io.File(dir + "__stage"); stage.mkdirs()
    Files.writeString(java.nio.file.Path.of(stage.toString, "part-00000.parquet"), "garbage")
    val old = new java.io.File(dir + "__old"); old.mkdirs()
    Files.writeString(java.nio.file.Path.of(old.toString, "leftover.parquet"), "stale")

    // table reads are unaffected by the stale dirs (readers point at `t` only)
    assert(spark.read.parquet(dir).count() == 1L)
    // the next merge clobbers both stale dirs and publishes cleanly
    val v2 = Seq((2L, "b", 20.0)).toDF("id", "name", "v")
    assert(ParquetUpsert.mergeByKey(spark, dir, v2, Seq("id")) == 2L)
    assert(spark.read.parquet(dir).orderBy("id").select("id").as[Long].collect().toSeq == Seq(1L, 2L))
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(parent == Seq("t"), s"leftovers: $parent")
  }
}
