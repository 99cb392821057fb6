package graft.etl

import org.apache.spark.sql.SparkSession

/** Scheduler entry point (SURVEY §2.8 X1/X2): one invocation = one
  * scheduled run of the emission ETL — create-if-absent, extract,
  * dims, fact, idempotent append — callable from cron / Airflow
  * SparkSubmitOperator / anything that can run a JVM main. The engine
  * itself stays scheduler-agnostic.
  *
  * Usage: EtlRunner <warehouseDir> <driversCsv> <carsCsv> <logbookCsv>
  *        [--archive <usedDirRoot>]
  */
object EtlRunner {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: EtlRunner <warehouseDir> <driversCsv> <carsCsv> <logbookCsv> [--archive <dir>]")
    val Array(wh, driversCsv, carsCsv, logbookCsv) = args.take(4)
    val archiveRoot = args.sliding(2).collectFirst {
      case Array("--archive", d) => d
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("emission-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val etl = new EmissionEtl(spark, wh)
    val t0 = System.nanoTime()
    val appended = etl.run(driversCsv, carsCsv, logbookCsv)
    val secs = (System.nanoTime() - t0) / 1e9

    // referential-integrity gate (the engine-level stand-in for the
    // reference's Postgres FOREIGN KEYs): report orphan counts per FK
    // after every load; SPARK_GRAFT_FK_STRICT=1 fails the run on any
    // orphan so a malformed feed stops the pipeline instead of
    // silently loading dangling ids. Default is report-only — the
    // archive step still runs, matching RESTRICT-at-load semantics
    // only when explicitly requested.
    val orphans = WarehouseQa.emissionOrphanReport(etl).collect()
      .map(r => r.getAs[String]("fk") -> r.getAs[Long]("orphan_rows"))
    orphans.filter(_._2 > 0).foreach { case (fk, n) =>
      System.err.println(s"[etl-qa] FK violation: $fk has $n orphan rows")
    }
    if (sys.env.get("SPARK_GRAFT_FK_STRICT").contains("1") && orphans.exists(_._2 > 0))
      throw new IllegalStateException(
        "FK validation failed: " + orphans.filter(_._2 > 0).mkString(", "))

    // archive AFTER a successful load (fixes the reference's
    // move-before-load crash window, SURVEY §7.7)
    archiveRoot.foreach { root =>
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("dd_MM_yyyy_HH_mm_ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      etl.archive(driversCsv, s"$root/drivers_used_data", ts)
      etl.archive(carsCsv, s"$root/cars_used_data", ts)
      etl.archive(logbookCsv, s"$root/logbook_used_data", ts)
    }

    val counts = appended.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"etl":"emission","appended":$counts,"fk_orphans":${orphans.map(_._2).sum},"secs":$secs}""")
    spark.stop()
  }
}
