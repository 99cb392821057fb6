package graft.etl

import java.nio.file.Files

import graft.SparkSpec

/** §7.6 fidelity: the engine fixes the reference's incremental-country
  * bug by default, and replicates it under `strictCompat` (incremental
  * runs consider START countries only — emission-dag.py:131).
  */
class CompatSpec extends SparkSpec {
  import spark.implicits._

  private def logbook(startCountry: String, targetCountry: String) =
    Seq(("CityA", startCountry, "CityB", targetCountry))
      .toDF("start_city", "start_country", "target_city", "target_country")

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
}
