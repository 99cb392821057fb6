package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dims.DateDim
import graft.ops.RelationalOps._

/** The reference pipeline (aniketkapdule/emission-project,
  * dags/emission-dag.py) re-expressed Spark-first: one lazy plan per
  * warehouse table, broadcast-hash joins for every dimension lookup,
  * null-safe keys where pandas matched NaN=NaN, and an idempotent
  * anti-join append protocol.
  *
  * Warehouse = parquet directories under `warehouseDir` (the reference
  * used Postgres tables; SURVEY §2.1 S7). All writes go through a
  * stage-then-publish rename so a crashed run never leaves a
  * half-written table (SURVEY §7.7).
  */
class EmissionEtl(
    spark: SparkSession,
    warehouseDir: String,
    strictCompat: Boolean = false,
    storeOpt: Option[graft.sources.TableStore] = None) {

  import EmissionEtl._

  /** Warehouse backend — parquet directories by default, or any
    * [[graft.sources.TableStore]] (e.g. [[graft.sources.JdbcStore]],
    * the reference's literal Postgres shape, utils.py:31-40).
    */
  val store: graft.sources.TableStore =
    storeOpt.getOrElse(new graft.sources.ParquetStore(spark, warehouseDir))

  // feed/archive file ops are independent of the warehouse backend
  private val fs = new Path(warehouseDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tableExists(name: String): Boolean = store.exists(name)

  def readTable(name: String): DataFrame = store.read(name)

  /** Dim append of pre-filtered novel rows, keyed by the surrogate
    * key. ParquetStore stages + swaps (a crash leaves the old or the
    * new table, never a mix); JdbcStore appends transactionally.
    * Affordable because dims are small; the fact table takes the
    * partitioned append path in [[appendFact]] instead (rewriting a
    * fact table per append does not survive scale).
    */
  private def append(df: DataFrame, name: String, key: String): Unit =
    store.appendKeyed(df, name, key)

  /** Materialize a small dim batch once (persist → use → unpersist):
    * the count probe and the staged merge's two references to the
    * updates plan would otherwise re-run the full anti-join + max-key
    * lineage once per action.
    */
  private def withCached[T](df: DataFrame)(f: DataFrame => T): T = {
    val cached = df.persist()
    try f(cached) finally cached.unpersist()
  }

  // ---------------------------------------------------------------- extract

  /** S1/S2 — read a feed if present, else an empty frame with the
    * expected schema (dags/emission-dag.py:39-66).
    */
  def readFeed(path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (fs.exists(new Path(path)))
      spark.read.option("header", "true").schema(schema).csv(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** S3 — archival move of a consumed feed (emission-dag.py:37,41).
    * Done AFTER a successful load (the reference moved first — crash
    * window fixed per SURVEY §7.7).
    */
  def archive(path: String, usedDir: String, ts: String): Unit = {
    val src = new Path(path)
    if (fs.exists(src)) {
      fs.mkdirs(new Path(usedDir))
      val base = src.getName.stripSuffix(".csv")
      fs.rename(src, new Path(s"$usedDir/${base}_$ts.csv"))
    }
  }

  // ------------------------------------------------------------ dimensions

  /** Create the date dim once (create_tables.py:69-85). */
  def ensureDateDim(): Unit =
    if (!tableExists("date"))
      store.overwrite(DateDim.generate(spark), "date")

  /** Drivers dim: project, sort by name, dedup keep-first, assign keys,
    * append only unseen (name, first_name) pairs
    * (emission-dag.py:73-85).
    */
  def loadDrivers(feed: DataFrame): Long = {
    val clean = dedupKeepFirst(
      feed.select("name", "first_name"),
      Seq("name", "first_name"),
      Seq(col("name")))
    val novel =
      if (!tableExists("drivers")) clean
      else antiJoinNew(clean, readTable("drivers"), Seq("name", "first_name"),
        broadcastRight = true)
    val existingMax =
      if (!tableExists("drivers")) 0L
      else readTable("drivers").agg(coalesce(max(col("driver_id")).cast("long"), lit(0L))).head.getLong(0)
    val keyed = withSurrogateKey(
      novel, "driver_id", Seq(col("name"), col("first_name")), existingMax)
      .select("driver_id", "name", "first_name")
    val n = withCached(keyed) { k =>
      val n = k.count()
      if (n > 0) append(k, "drivers", "driver_id")
      n
    }
    n
  }

  /** Cars dim: rename raw headers, sort by brand, dedup on the 7-col
    * key keep-first, append unseen cars on all 12 columns null-safely
    * (emission-dag.py:88-110 — `cylinders`/`fuel_type` nullable).
    */
  def loadCars(feedRaw: DataFrame): Long = {
    val renamed = feedRaw.withColumnsRenamed(Schemas.carsRename)
    val clean = dedupKeepFirst(
      renamed,
      Schemas.carsDedupKey,
      Seq(col("brand")))
    val all12 = Schemas.carsRename.values.toSeq
    val novel =
      if (!tableExists("cars")) clean
      else antiJoinNew(clean, readTable("cars"), all12, broadcastRight = true)
    val existingMax =
      if (!tableExists("cars")) 0L
      else readTable("cars").agg(coalesce(max(col("car_id")).cast("long"), lit(0L))).head.getLong(0)
    val keyed = withSurrogateKey(novel, "car_id", Seq(col("brand"), col("model")), existingMax)
    val n = withCached(keyed.select((Seq("car_id") ++ carCols).map(col): _*)) { k =>
      val n = k.count()
      if (n > 0) append(k, "cars", "car_id")
      n
    }
    n
  }

  /** Country dim from logbook start+target countries
    * (emission-dag.py:113-134). The reference's incremental branch only
    * checks START countries (bug §7.6-1); fixed here unless
    * `strictCompat`.
    */
  def loadCountries(logbook: DataFrame): Long = {
    val start = logbook.select(col("start_country").as("country_name"))
    val target = logbook.select(col("target_country").as("country_name"))
    val incoming =
      if (strictCompat && tableExists("country")) start.distinct()
      else unionDistinct(start, target)
    val novel =
      if (!tableExists("country")) incoming
      else antiJoinNew(incoming, readTable("country"), Seq("country_name"),
        broadcastRight = true)
    val existingMax =
      if (!tableExists("country")) 0L
      else readTable("country").agg(coalesce(max(col("country_id")).cast("long"), lit(0L))).head.getLong(0)
    val keyed = withSurrogateKey(novel, "country_id", Seq(col("country_name")), existingMax)
      .select("country_id", "country_name")
    val n = withCached(keyed) { k =>
      val n = k.count()
      if (n > 0) append(k, "country", "country_id")
      n
    }
    n
  }

  /** City dim from logbook start+target cities with their countries
    * (emission-dag.py:137-155). Reference bugs §7.6-2/3 (cross-branch
    * variable, country dropped from the incremental key) are fixed by
    * default: cities are keyed (city_name, country) and always carry
    * country_id. Under `strictCompat` the incremental branch replicates
    * bug 3 byte-for-byte (emission-dag.py:153-154): the anti-join keys
    * on `city_name` ALONE — a known city name in a brand-new country is
    * never loaded — and the surviving rows have dropped `country_name`
    * without ever joining ids, so novel cities load with NULL
    * country_id. (Bug 2, the cross-branch `df_country_clean` reference
    * in the initial branch, emission-dag.py:146-147, is a NameError /
    * duplicate-column crash hazard with no defined output semantics —
    * there is nothing to replicate but an exception, so both modes take
    * the fixed initial path.)
    */
  def loadCities(logbook: DataFrame): Long = {
    val start = logbook.select(
      col("start_city").as("city_name"), col("start_country").as("country_name"))
    val target = logbook.select(
      col("target_city").as("city_name"), col("target_country").as("country_name"))
    val incoming = unionDistinct(start, target)
    lazy val withCountry = nullSafeEquiJoin(
      incoming, readTable("country"), Seq("country_name"), "left",
      broadcastRight = true)
      .select("city_name", "country_id")
    val novel =
      if (!tableExists("city")) withCountry
      else if (strictCompat) {
        val countryIdType = readTable("country").schema("country_id").dataType
        antiJoinNew(incoming, readTable("city"), Seq("city_name"),
          broadcastRight = true)
          .select(col("city_name"), lit(null).cast(countryIdType).as("country_id"))
      }
      else antiJoinNew(withCountry, readTable("city"), Seq("city_name", "country_id"),
        broadcastRight = true)
    val existingMax =
      if (!tableExists("city")) 0L
      else readTable("city").agg(coalesce(max(col("city_id")).cast("long"), lit(0L))).head.getLong(0)
    val keyed = withSurrogateKey(novel, "city_id", Seq(col("city_name")), existingMax)
      .select("city_id", "city_name", "country_id")
    val n = withCached(keyed) { k =>
      val n = k.count()
      if (n > 0) append(k, "city", "city_id")
      n
    }
    n
  }

  // ------------------------------------------------------------------ fact

  /** Fact build (emission-dag.py:158-209):
    * J1 logbook⋈cars (null-safe, 6 keys) → P4 total_emission →
    * J2 drivers → J3 date → J9/J10 city/country role joins →
    * J11 idempotent anti-join append.
    *
    * Every dimension side is broadcast — at 100 TB the logbook (fact
    * feed) is the only large input and it never shuffles: the whole
    * chain is map-side joins over one scan.
    */
  def buildFact(logbook: DataFrame): DataFrame = {
    val cars = readTable("cars")
      .select((Seq("car_id", "co2_emission_g_per_km") ++ Schemas.carNaturalKey).distinct.map(col): _*)
    val drivers = readTable("drivers")
    val dateDim = readTable("date").select("date_id", "date")
    val city = readTable("city").select("city_id", "city_name", "country_id")
    val country = readTable("country")

    val withCar = nullSafeEquiJoin(
      logbook, cars, Schemas.carNaturalKey, "left", broadcastRight = true)

    val withEmission = withCar.withColumn(
      "total_emission", col("distance_km") * col("co2_emission_g_per_km"))

    val withDriver = withEmission.join(
      broadcast(drivers), Seq("name", "first_name"), "left")

    val withDate = withDriver
      .withColumn("date", to_date(col("date")))
      .join(broadcast(dateDim), Seq("date"), "left")

    def countryLookup(df: DataFrame, role: String): DataFrame =
      df.join(
        broadcast(country.withColumnsRenamed(
          Map("country_id" -> s"${role}_country_id", "country_name" -> s"${role}_country"))),
        Seq(s"${role}_country"), "left")

    // city keyed on (name, country) — the reference joins on name only
    // (§7.6 bug 4: ambiguous if one city name exists in two countries;
    // emission-dag.py:177-184 and a duplicated name would multiply fact
    // rows, pandas-merge style); countries therefore resolve first.
    // strictCompat replicates the name-only key.
    def cityLookup(df: DataFrame, role: String): DataFrame =
      if (strictCompat)
        df.join(
          broadcast(city.drop("country_id").withColumnsRenamed(Map(
            "city_id" -> s"${role}_city_id",
            "city_name" -> s"${role}_city"))),
          Seq(s"${role}_city"), "left")
      else df.join(
        broadcast(city.withColumnsRenamed(Map(
          "city_id" -> s"${role}_city_id",
          "city_name" -> s"${role}_city",
          "country_id" -> s"${role}_country_id"))),
        Seq(s"${role}_city", s"${role}_country_id"), "left")

    cityLookup(cityLookup(countryLookup(countryLookup(
      withDate, "start"), "target"), "start"), "target")
      .select(
        col("car_id"), col("driver_id"),
        col("start_city_id"), col("start_country_id"),
        col("target_city_id"), col("target_country_id"),
        col("distance_km"), col("date_id"), col("total_emission"))
  }

  /** J11 — append only fact rows whose 7-id tuple is unseen; ids can be
    * null (unmatched dims) so the anti-join is null-safe.
    *
    * The fact table is partitioned by month (`p_month` = date_id/100);
    * the idempotence anti-join reads ONLY the partitions the incoming
    * batch touches (plus the null partition for unmatched-date rows) —
    * at warehouse scale the rewrite/read cost is bounded by the
    * batch's date spread, not the table size (SURVEY §7.7).
    */
  def appendFact(fact: DataFrame): Long = {
    val deduped = dedupKeepFirst(fact, Schemas.factIdKey, Seq(col("distance_km")))
      .withColumn("p_month", (col("date_id") / lit(100)).cast("int"))
    val novel =
      if (!tableExists("car_driver_log")) deduped
      else {
        val months = deduped.select("p_month").distinct()
          .collect().map(r => Option(r.get(0)).map(_.toString.toInt))
        val monthVals = months.flatten.toSeq
        val existing = readTable("car_driver_log")
          .filter(
            col("p_month").isin(monthVals: _*) ||
              (if (months.contains(None)) col("p_month").isNull else lit(false)))
        antiJoinNew(deduped, existing, Schemas.factIdKey)
      }
    val n = novel.count()
    if (n > 0) store.appendPartitioned(novel, "car_driver_log", "p_month")
    n
  }

  /** One scheduled run (X1/X2): dims then fact, all idempotent. */
  def run(driversCsv: String, carsCsv: String, logbookCsv: String): Map[String, Long] = {
    ensureDateDim()
    val drivers = readFeed(driversCsv, Schemas.driversFeed)
    val carsRaw = readFeed(carsCsv, Schemas.carsFeedRaw)
    val logbook = readFeed(logbookCsv, Schemas.logbookFeed)
    val nDrivers = loadDrivers(drivers)
    val nCars = loadCars(carsRaw)
    val nCountries = loadCountries(logbook)
    val nCities = loadCities(logbook)
    val nFact = if (logbook.isEmpty) 0L else appendFact(buildFact(logbook))
    Map(
      "drivers" -> nDrivers, "cars" -> nCars, "country" -> nCountries,
      "city" -> nCities, "car_driver_log" -> nFact)
  }

  // ------------------------------------------------------------- analytics

  /** A4 — the reference's headline rollups (README.md:3): total
    * emission by brand / car / driver over the star schema.
    */
  def emissionByBrand(): DataFrame =
    readTable("car_driver_log")
      .join(broadcast(readTable("cars").select("car_id", "brand")), Seq("car_id"))
      .groupBy("brand")
      .agg(sum("total_emission").as("total_emission"))

  def emissionByCar(): DataFrame =
    readTable("car_driver_log")
      .groupBy("car_id")
      .agg(sum("total_emission").as("total_emission"))

  def emissionByDriver(): DataFrame =
    readTable("car_driver_log")
      .join(broadcast(readTable("drivers")), Seq("driver_id"))
      .groupBy("driver_id", "name", "first_name")
      .agg(sum("total_emission").as("total_emission"))
}

object EmissionEtl {
  /** Warehouse cars column order (dags/create_tables.py:31-46). */
  val carCols: Seq[String] = Seq(
    "brand", "model", "vehicle_class", "engine_size_l", "cylinders",
    "transmission", "fuel_type", "fuel_consumption_l_per_hundred_km",
    "hwy_l_per_hundred_km", "comb_l_per_hundred", "comb_mpg",
    "co2_emission_g_per_km")
}
