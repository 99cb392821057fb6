package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-level referential-integrity validation (SURVEY §7.3).
  *
  * The reference declares 7 FOREIGN KEYs with RESTRICT/CASCADE
  * (dags/create_tables.py:55-125: city.country_id → country plus six
  * fact keys → cars/drivers/date/city×2/country×2) and relies on
  * Postgres to reject orphan rows at load time. Spark has no FK
  * enforcement, so the equivalent safety net is a QA pass that REPORTS
  * orphans: child rows whose non-null key value has no parent row. A
  * malformed feed then fails loudly in the pipeline's QA gate instead
  * of silently loading orphan ids.
  */
object WarehouseQa {

  /** One declared FK-style check: rows of the child table whose
    * `childCol` is non-null and absent from `parent`'s `parentKey`
    * column count as orphans (SQL FK semantics: NULL never violates).
    */
  final case class Fk(name: String, childCol: String, parent: DataFrame, parentKey: String)

  /** Orphan-row counts for several FKs of ONE child table in a single
    * pass: one scan of `child`, one broadcast left join per FK against
    * the parent's distinct keys (dimension key sets are small by
    * construction — if a parent ever isn't, swap that join's hint),
    * one aggregation, then an unpivot of the single result row into
    * long format (fk, orphan_rows).
    */
  def orphanCounts(child: DataFrame, fks: Seq[Fk]): DataFrame = {
    require(fks.nonEmpty, "no FK checks given")
    var cur = child.select(fks.map(_.childCol).distinct.map(col): _*)
    fks.zipWithIndex.foreach { case (fk, i) =>
      cur = cur.join(
        broadcast(fk.parent.select(col(fk.parentKey).as(s"__pk_$i")).distinct()),
        col(fk.childCol) === col(s"__pk_$i"), "left")
    }
    val counts = fks.zipWithIndex.map { case (fk, i) =>
      sum(when(col(fk.childCol).isNotNull && col(s"__pk_$i").isNull, 1L)
        .otherwise(0L)).as(s"__o_$i")
    }
    val row = cur.agg(counts.head, counts.tail: _*)
    row.select(explode(array(fks.zipWithIndex.map { case (fk, i) =>
      struct(lit(fk.name).as("fk"), col(s"__o_$i").as("orphan_rows"))
    }: _*)).as("r")).select(col("r.fk").as("fk"), col("r.orphan_rows").as("orphan_rows"))
  }

  /** The reference's full FK set over an [[EmissionEtl]] warehouse:
    * city→country plus the six fact FKs, unioned into one report.
    * Missing tables are skipped (pre-first-load warehouse).
    */
  def emissionOrphanReport(etl: EmissionEtl): DataFrame = {
    val reports = Seq.newBuilder[DataFrame]
    if (etl.tableExists("city") && etl.tableExists("country"))
      reports += orphanCounts(etl.readTable("city"), Seq(
        Fk("city.country_id->country", "country_id", etl.readTable("country"), "country_id")))
    if (etl.tableExists("car_driver_log")) {
      val fact = etl.readTable("car_driver_log")
      val fks = Seq.newBuilder[Fk]
      if (etl.tableExists("cars"))
        fks += Fk("fact.car_id->cars", "car_id", etl.readTable("cars"), "car_id")
      if (etl.tableExists("drivers"))
        fks += Fk("fact.driver_id->drivers", "driver_id", etl.readTable("drivers"), "driver_id")
      if (etl.tableExists("date"))
        fks += Fk("fact.date_id->date", "date_id", etl.readTable("date"), "date_id")
      if (etl.tableExists("city")) {
        val city = etl.readTable("city")
        fks += Fk("fact.start_city_id->city", "start_city_id", city, "city_id")
        fks += Fk("fact.target_city_id->city", "target_city_id", city, "city_id")
      }
      if (etl.tableExists("country")) {
        val country = etl.readTable("country")
        fks += Fk("fact.start_country_id->country", "start_country_id", country, "country_id")
        fks += Fk("fact.target_country_id->country", "target_country_id", country, "country_id")
      }
      val f = fks.result()
      if (f.nonEmpty) reports += orphanCounts(fact, f)
    }
    reports.result().reduceOption(_ unionByName _)
      .getOrElse(throw new IllegalStateException("no warehouse tables to validate"))
  }
}
