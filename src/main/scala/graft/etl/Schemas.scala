package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the three CSV feeds and the warehouse tables
  * (SURVEY §1; FIXTURES.md A1-A4). Schemas are pinned — never inferred —
  * so a malformed feed fails loudly instead of silently changing types
  * (the reference relies on pandas inference: dags/emission-dag.py:40).
  */
object Schemas {

  /** drivers.csv — reference data/drivers_incoming_data/ (3 cols). */
  val driversFeed: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("first_name", StringType),
    StructField("city", StringType)))

  /** vehicle_fuel_consumptions.csv raw headers
    * (renamed on read — dags/emission-dag.py:89-92).
    */
  val carsFeedRaw: StructType = StructType(Seq(
    StructField("BRAND", StringType),
    StructField("MODEL", StringType),
    StructField("VEHICLE CLASS", StringType),
    StructField("ENGINE SIZE L", DoubleType),
    StructField("CYLINDERS", DoubleType),
    StructField("TRANSMISSION", StringType),
    StructField("FUEL_TYPE", StringType),
    StructField("FUEL CONSUMPTION (L/100 km)", DoubleType),
    StructField("HWY (L/100 km)", DoubleType),
    StructField("COMB (L/100 km)", DoubleType),
    StructField("COMB (mpg)", IntegerType),
    StructField("CO2_Emissions(g/km)", IntegerType)))

  /** Raw→warehouse column rename map (dags/emission-dag.py:89-92). */
  val carsRename: Map[String, String] = Map(
    "BRAND" -> "brand",
    "MODEL" -> "model",
    "VEHICLE CLASS" -> "vehicle_class",
    "ENGINE SIZE L" -> "engine_size_l",
    "CYLINDERS" -> "cylinders",
    "TRANSMISSION" -> "transmission",
    "FUEL_TYPE" -> "fuel_type",
    "FUEL CONSUMPTION (L/100 km)" -> "fuel_consumption_l_per_hundred_km",
    "HWY (L/100 km)" -> "hwy_l_per_hundred_km",
    "COMB (L/100 km)" -> "comb_l_per_hundred",
    "COMB (mpg)" -> "comb_mpg",
    "CO2_Emissions(g/km)" -> "co2_emission_g_per_km")

  /** drivers_logbook.csv (14 cols — FIXTURES.md A3). */
  val logbookFeed: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("model", StringType),
    StructField("engine_size_l", DoubleType),
    StructField("cylinders", DoubleType),
    StructField("fuel_type", StringType),
    StructField("transmission", StringType),
    StructField("name", StringType),
    StructField("first_name", StringType),
    StructField("start_city", StringType),
    StructField("start_country", StringType),
    StructField("target_city", StringType),
    StructField("target_country", StringType),
    StructField("distance_km", DoubleType),
    StructField("date", StringType)))

  /** The 6-col natural join key logbook↔cars (dags/emission-dag.py:158).
    * `cylinders`/`fuel_type` are nullable ⇒ joins must be null-safe.
    */
  val carNaturalKey: Seq[String] =
    Seq("brand", "model", "engine_size_l", "cylinders", "fuel_type", "transmission")

  /** 7-col cars dedup key (dags/emission-dag.py:96). */
  val carsDedupKey: Seq[String] =
    Seq("brand", "model", "vehicle_class", "engine_size_l", "cylinders",
      "transmission", "fuel_type")

  /** Fact-table identity key for the idempotent append (emission-dag.py:201,204). */
  val factIdKey: Seq[String] =
    Seq("car_id", "driver_id", "start_city_id", "start_country_id",
      "target_country_id", "target_city_id", "date_id")
}
