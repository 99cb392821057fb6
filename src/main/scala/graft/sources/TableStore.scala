package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse storage backend for the ETL (reference dags/utils.py:31-40
  * read and wrote a Postgres warehouse via one SQLAlchemy engine; the
  * parquet warehouse is this engine's native choice). The ETL logic is
  * storage-agnostic — anti-join idempotence, surrogate keys and month
  * pruning are Spark-side — so the backend only needs existence, scan,
  * and two append shapes.
  */
trait TableStore {
  def exists(name: String): Boolean
  def read(name: String): DataFrame
  def overwrite(df: DataFrame, name: String): Unit

  /** Append pre-deduplicated dim rows carrying unique `key` values —
    * atomic/staged where the backend needs it (files), transactional
    * where the backend provides it (JDBC).
    */
  def appendKeyed(df: DataFrame, name: String, key: String): Unit

  /** Fact append, physically partitioned by `partitionCol` where the
    * backend supports layout (parquet); relational backends keep it as
    * an ordinary indexed column.
    */
  def appendPartitioned(df: DataFrame, name: String, partitionCol: String): Unit
}

/** Parquet-directory warehouse: one directory per table under `dir`.
  * Dim appends go through the staged whole-table swap
  * ([[ParquetUpsert.mergeByKey]]) so readers never observe a partial
  * append; the fact table uses a partitioned plain append (whole-table
  * rewrites don't survive fact scale — partition-level staging is the
  * upgrade path there).
  */
final class ParquetStore(spark: SparkSession, dir: String) extends TableStore {
  import org.apache.hadoop.fs.Path
  private val fs = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def path(name: String) = s"$dir/$name"

  def exists(name: String): Boolean = fs.exists(new Path(path(name)))
  def read(name: String): DataFrame = spark.read.parquet(path(name))
  def overwrite(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").parquet(path(name))
  def appendKeyed(df: DataFrame, name: String, key: String): Unit =
    ParquetUpsert.mergeByKey(spark, path(name), df, Seq(key))

  /** Fact append via a partition-level stage: the batch writes
    * (partitioned) to a `__fact_stage` dir first, then its data files
    * rename into the matching table partition dirs under unique names.
    * A crash during the WRITE (the long phase — the whole Spark job,
    * including its commit) leaves the table completely untouched; the
    * exposed window shrinks to the same-filesystem rename loop, and a
    * crash there is recoverable: moved rows are visible and excluded by
    * the caller's idempotence anti-join on re-run, unmoved rows are
    * recomputed after the stale stage is clobbered. (Whole-table swap —
    * the dims' appendKeyed path — would make even that window
    * all-or-nothing, but rewriting a fact table per append does not
    * survive scale.)
    */
  def appendPartitioned(df: DataFrame, name: String, partitionCol: String): Unit = {
    val stage = new Path(path(name) + "__fact_stage")
    fs.delete(stage, true)
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(stage.toString)
    val target = new Path(path(name))
    fs.mkdirs(target)
    val batchId = java.util.UUID.randomUUID().toString.take(8)
    fs.listStatus(stage).foreach { part =>
      if (part.isDirectory && part.getPath.getName.startsWith(s"$partitionCol=")) {
        val destDir = new Path(target, part.getPath.getName)
        fs.mkdirs(destDir)
        fs.listStatus(part.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .foreach { f =>
            val dest = new Path(destDir, s"b$batchId-${f.getPath.getName}")
            if (!fs.rename(f.getPath, dest))
              throw new java.io.IOException(s"cannot publish ${f.getPath} -> $dest")
          }
      }
    }
    fs.delete(stage, true)
  }
}

/** JDBC warehouse — the literal shape of the reference's Postgres
  * engine (dags/utils.py:31-40: pd.read_sql / to_sql over one
  * connection URL). Reads go through Spark's JDBC source, so Catalyst
  * pushes filters down as SQL WHERE clauses (the month-pruned fact
  * anti-join becomes an indexed range scan server-side); writes use
  * the batched JDBC writer, and appends are transactional per batch —
  * no staging needed, the database's atomicity replaces the parquet
  * rename dance.
  *
  * Tested against embedded Derby (FormatsSpec); any server a Spark
  * JDBC dialect exists for (Postgres included) takes the same URL.
  */
final class JdbcStore(
    spark: SparkSession,
    url: String,
    props: Properties = new Properties) extends TableStore {

  def exists(name: String): Boolean = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
      var found = false
      while (!found && rs.next())
        found = rs.getString("TABLE_NAME").equalsIgnoreCase(name)
      found
    } finally conn.close()
  }
  def read(name: String): DataFrame = spark.read.jdbc(url, name, props)
  def overwrite(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").jdbc(url, name, props)
  def appendKeyed(df: DataFrame, name: String, key: String): Unit =
    df.write.mode("append").jdbc(url, name, props)
  def appendPartitioned(df: DataFrame, name: String, partitionCol: String): Unit =
    df.write.mode("append").jdbc(url, name, props)
}
