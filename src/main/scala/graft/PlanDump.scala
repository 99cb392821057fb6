package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of declared queries to files — the
  * plan-artifact producer for optimization rounds (`plans/r{N}/`).
  *
  * args: <sfDir> <outDir> <suffix> <q1,q2,...>
  * Each query's DataFrame is BUILT (lifecycle queries run their
  * commits) and its final plan written to `<outDir>/<q>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, qcsv) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val wanted = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val byName = SparkEntry.queries
    wanted.foreach { q =>
      try {
        val df = byName(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"), txt)
        println(s"[plandump] wrote ${q}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
