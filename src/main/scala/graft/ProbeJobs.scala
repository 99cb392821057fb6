package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** TEMP probe (deleted before round close): counts Spark jobs per
  * lifecycle phase of a keyed replication advance, so per-advance
  * fixed costs are attributable job by job.
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var trace = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace) println(s"  JOB ${js.jobId}: " +
          js.stageInfos.map(si => si.name.take(60)).mkString(" | "))
      }
    })
    def phase[T](label: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      Thread.sleep(50) // listener drain
      println(f"PHASE $label%-22s jobs=${jobs.get() - j0}%3d secs=${(System.nanoTime() - t0) / 1e9}%6.2f")
      r
    }
    import org.apache.spark.sql.functions._
    val c = Tables.table(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val src = "/tmp/probe_repl_src"; val dst = "/tmp/probe_repl_dst"
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(src, dst).foreach { p =>
      val fp = new org.apache.hadoop.fs.Path(p)
      fp.getFileSystem(conf).delete(fp, true)
    }
    phase("seed_write") {
      c.repartition(1).write.parquet(src)
      graft.ops.TxLog.convert(spark, src)
    }
    phase("resync") {
      graft.ops.TxLog.replicateTo(spark, src, dst, "c_custkey")
    }
    phase("cow_delete") {
      graft.ops.DeleteWhere.where(spark, src,
        pmod(col("c_custkey"), lit(7)) === 0)
    }
    val upd = phase("upd_build") {
      graft.ops.TxLog.snapshot(spark, src)
        .filter(pmod(col("c_custkey"), lit(10)) === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1000)
        .localCheckpoint()
    }
    phase("mor_upsert") {
      graft.ops.DeletionVectors.upsert(spark, src, upd,
        keyCols = Seq("c_custkey"))
    }
    val feed = phase("diff_build") {
      val (d, _) = graft.ops.TxLog.diffSince(spark, src, 0)
      graft.ops.TxLog.asChangeFeed(d).localCheckpoint()
    }
    trace = true
    phase("apply_changes") {
      graft.ops.UpsertWhere.applyChanges(spark, dst, "c_custkey", feed)
    }
    trace = false
    phase("churn_advance") {
      graft.ops.TxLog.replicateTo(spark, src, dst, "c_custkey")
    }
    phase("noop_advance") {
      graft.ops.TxLog.replicateTo(spark, src, dst, "c_custkey")
    }
    spark.stop()
  }
}
