package graft.dims

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date dimension generator (SURVEY §2.7 — reference:
  * dags/create_tables.py:6-15, `create_date_dim`).
  *
  * The one Generator-shaped op in the reference: `pd.date_range` →
  * Spark `explode(sequence(...))` — a built-in generator, evaluated
  * distributed (the sequence is produced once and exploded; for a
  * 20-year dim that is 7,306 rows, trivially broadcastable to every
  * join that needs a `date_id`).
  *
  * Column semantics match the reference exactly:
  *  - `date_id` smart key yyyyMMdd  (create_tables.py:14)
  *  - `week_day` full English day name (create_tables.py:8)
  *  - `week` ISO-8601 week of year (create_tables.py:11 —
  *    `isocalendar().week`; Spark `weekofyear` is also ISO-8601)
  */
object DateDim {

  def generate(
      spark: SparkSession,
      start: String = "2010-01-01",
      end: String = "2030-01-01"): DataFrame = {
    spark
      .sql(
        s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 day)) AS date")
      .select(
        date_format(col("date"), "yyyyMMdd").cast("int").as("date_id"),
        col("date"),
        date_format(col("date"), "EEEE").as("week_day"),
        dayofmonth(col("date")).as("day"),
        month(col("date")).as("month"),
        weekofyear(col("date")).as("week"),
        quarter(col("date")).as("quarter"),
        year(col("date")).as("year"))
  }
}
