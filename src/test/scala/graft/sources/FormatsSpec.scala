package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: ORC, JSON lines, CSV —
  * each written and re-read with an explicit schema (the engine never
  * infers schemas on ingest, SURVEY §1.1), asserting the round trip
  * preserves rows and values exactly.
  */
class FormatsSpec extends SparkSpec {

  private def checksum(df: DataFrame): Long =
    df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0) // order-independent, no ANSI overflow

  private lazy val orders = graft.Tables.orders(spark, sf("orders"))

  test("ORC round trip preserves schema and values") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    orders.write.orc(dir)
    val back = spark.read.schema(orders.schema).orc(dir)
    assert(back.schema == orders.schema)
    assert(back.count() == orders.count())
    assert(checksum(back) == checksum(orders))
  }

  test("JSON-lines round trip with explicit schema (no inference)") {
    val dir = Files.createTempDirectory("graft_json").toString + "/t"
    orders.write.json(dir)
    val back = spark.read.schema(orders.schema).json(dir)
    assert(back.count() == orders.count())
    assert(checksum(back) == checksum(orders))
  }

  test("CSV round trip with explicit schema and timestamp format") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/t"
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    orders.write
      .option("header", "true").option("timestampFormat", fmt)
      .csv(dir)
    val back = spark.read
      .option("header", "true").option("timestampFormat", fmt)
      .schema(orders.schema)
      .csv(dir)
    assert(back.count() == orders.count())
    assert(checksum(back) == checksum(orders))
  }
}
