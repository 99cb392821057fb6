package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** §7.6 fidelity: the engine fixes the reference's four latent bugs by
  * default and replicates the output-affecting ones under
  * `strictCompat`: bug 1 (incremental country load considers START
  * countries only — emission-dag.py:131), bug 3 (incremental city
  * anti-join keys on city_name alone and drops country, so a known
  * name in a new country never loads and novel cities get NULL
  * country_id — emission-dag.py:153-154), bug 4 (fact city lookups key
  * on name only — emission-dag.py:177-184). Bug 2 is a NameError
  * hazard with no output semantics; see the loadCities scaladoc.
  */
class CompatSpec extends SparkSpec {
  import spark.implicits._

  private def logbook(startCountry: String, targetCountry: String) =
    Seq(("CityA", startCountry, "CityB", targetCountry))
      .toDF("start_city", "start_country", "target_city", "target_country")

  private def cityLogbook(rows: (String, String, String, String)*) =
    rows.toSeq.toDF("start_city", "start_country", "target_city", "target_country")

  test("fixed semantics: incremental load picks up target-only countries") {
    val wh = Files.createTempDirectory("graft_wh_fixed").toString
    val etl = new EmissionEtl(spark, wh)
    assert(etl.loadCountries(logbook("A", "B")) == 2L) // initial: both
    assert(etl.loadCountries(logbook("C", "D")) == 2L) // incremental: both
    assert(etl.readTable("country").count() == 4L)
  }

  test("strictCompat replicates the reference bug: target-only countries missed") {
    val wh = Files.createTempDirectory("graft_wh_strict").toString
    val etl = new EmissionEtl(spark, wh, strictCompat = true)
    assert(etl.loadCountries(logbook("A", "B")) == 2L) // initial branch loads both
    assert(etl.loadCountries(logbook("C", "D")) == 1L) // incremental: start only
    assert(etl.readTable("country").count() == 3L) // D never loaded
  }

  test("fixed semantics: same city name in a second country loads, with country_id") {
    val wh = Files.createTempDirectory("graft_wh_city_fixed").toString
    val etl = new EmissionEtl(spark, wh)
    val run1 = cityLogbook(("Alpha", "X", "Beta", "X"))
    etl.loadCountries(run1); assert(etl.loadCities(run1) == 2L)
    val run2 = cityLogbook(("Alpha", "Y", "Gamma", "X"))
    etl.loadCountries(run2)
    assert(etl.loadCities(run2) == 2L) // (Alpha,Y) AND (Gamma,X)
    val city = etl.readTable("city")
    assert(city.count() == 4L)
    assert(city.filter(col("country_id").isNull).count() == 0L)
  }

  test("strictCompat replicates bug 3: name-only city key, NULL country_id on novel rows") {
    val wh = Files.createTempDirectory("graft_wh_city_strict").toString
    val etl = new EmissionEtl(spark, wh, strictCompat = true)
    val run1 = cityLogbook(("Alpha", "X", "Beta", "X"))
    etl.loadCountries(run1); assert(etl.loadCities(run1) == 2L) // initial path: fixed
    val run2 = cityLogbook(("Alpha", "Y", "Gamma", "Y"))
    etl.loadCountries(run2)
    assert(etl.loadCities(run2) == 1L) // Alpha name exists -> (Alpha,Y) never loads
    val city = etl.readTable("city")
    assert(city.count() == 3L)
    // the novel city (Gamma) carries NULL country_id — country was dropped
    assert(city.filter(col("city_name") === "Gamma")
      .filter(col("country_id").isNull).count() == 1L)
  }

  test("strictCompat replicates bug 4: fact city lookup keys on name only") {
    val wh = Files.createTempDirectory("graft_wh_fact_strict").toString
    val strict = new EmissionEtl(spark, wh, strictCompat = true)
    // warehouse: city Alpha exists only in country X; country Y exists
    val run1 = cityLogbook(("Alpha", "X", "Delta", "Y"))
    strict.loadCountries(run1); strict.loadCities(run1)
    // minimal cars/drivers/date dims so buildFact's lookups resolve
    Seq((1L, "n", "f")).toDF("driver_id", "name", "first_name")
      .write.parquet(s"$wh/drivers")
    Seq((1L, "b", "m", 1.0, 4, "g", "a", 2.5))
      .toDF("car_id", "brand", "model", "engine_size_l", "cylinders",
        "fuel_type", "transmission", "co2_emission_g_per_km")
      .write.parquet(s"$wh/cars")
    Seq((20200101, java.sql.Date.valueOf("2020-01-01"))).toDF("date_id", "date")
      .write.parquet(s"$wh/date")
    // a trip through Alpha IN COUNTRY Y: strict keys on name only, so it
    // resolves to Alpha/X's city id; fixed mode finds no (Alpha, Y) city
    val trip = Seq(("n", "f", "b", "m", 1.0, 4, "g", "a", 100.0, "2020-01-01",
      "Alpha", "Y", "Alpha", "Y"))
      .toDF("name", "first_name", "brand", "model", "engine_size_l", "cylinders",
        "fuel_type", "transmission", "distance_km", "date",
        "start_city", "start_country", "target_city", "target_country")
    val alphaXId = strict.readTable("city")
      .filter(col("city_name") === "Alpha").select("city_id").head().get(0)
    val strictFact = strict.buildFact(trip)
    assert(strictFact.select("start_city_id").head().get(0) == alphaXId)
    val fixed = new EmissionEtl(spark, wh) // same warehouse, fixed semantics
    assert(fixed.buildFact(trip).select("start_city_id").head().isNullAt(0))
  }
}
