package graft.dims

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DateDimSpec extends SparkSpec {

  test("date dim has 7306 rows for 2010-01-01..2030-01-01 (reference create_tables.py:6)") {
    assert(DateDim.generate(spark).count() == 7306L)
  }

  test("date parts match reference semantics (smart key, day name, ISO week)") {
    val row = DateDim.generate(spark)
      .filter(col("date") === lit(java.sql.Date.valueOf("2014-05-16")))
      .head()
    assert(row.getAs[Int]("date_id") == 20140516)
    assert(row.getAs[String]("week_day") == "Friday")
    assert(row.getAs[Int]("day") == 16)
    assert(row.getAs[Int]("month") == 5)
    assert(row.getAs[Int]("week") == 20) // ISO week
    assert(row.getAs[Int]("quarter") == 2)
    assert(row.getAs[Int]("year") == 2014)
  }

  test("ISO week edge: 2010-01-01 is week 53 of ISO year 2009") {
    val row = DateDim.generate(spark)
      .filter(col("date") === lit(java.sql.Date.valueOf("2010-01-01")))
      .head()
    assert(row.getAs[Int]("week") == 53)
    assert(row.getAs[Int]("date_id") == 20100101)
  }
}
