package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchAggregatesSpec extends SparkSpec {

  test("KMV estimate within RSE bounds of exact distinct counts") {
    val li = graft.Tables.lineitem(spark, sf("lineitem"))
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact_p"),
      SketchFunctions.kmvDistinct(col("l_partkey"), k = 256).as("kmv_p"),
      countDistinct(col("l_orderkey")).as("exact_o"),
      SketchFunctions.kmvDistinct(col("l_orderkey"), k = 256).as("kmv_o")).collect()(0)
    for ((e, s) <- Seq((row.getLong(0), row.getLong(1)), (row.getLong(2), row.getLong(3)))) {
      val err = math.abs(s - e).toDouble / e
      assert(err < 0.25, s"KMV estimate $s vs exact $e (err $err)") // 4×RSE at k=256
    }
  }

  test("KMV is exact below k and deterministic across runs") {
    import spark.implicits._
    val small = (1 to 100).map(i => i % 37).toDF("v")
    val est1 = small.agg(SketchFunctions.kmvDistinct(col("v"), k = 256)).collect()(0).getLong(0)
    val est2 = small.agg(SketchFunctions.kmvDistinct(col("v"), k = 256)).collect()(0).getLong(0)
    assert(est1 == 37L) // fewer than k distinct hashes → exact
    assert(est1 == est2)
  }

  test("KMV ignores NULLs (COUNT DISTINCT semantics)") {
    import spark.implicits._
    val mixed = Seq[Option[Int]](Some(1), Some(2), None, Some(2), None, Some(3))
      .toDF("v")
    val row = mixed.agg(
      countDistinct(col("v")).as("exact"),
      SketchFunctions.kmvDistinct(col("v"), k = 256).as("kmv")).collect()(0)
    assert(row.getLong(1) == row.getLong(0)) // 3, not 4: null is no value
    val allNull = Seq[Option[Int]](None, None).toDF("v")
    assert(allNull.agg(SketchFunctions.kmvDistinct(col("v"))).collect()(0).getLong(0) == 0L)
  }

  test("KMV merges partial buffers across partitions consistently") {
    import spark.implicits._
    val wide = spark.range(0, 100000).select((col("id") % 5000).as("v"))
    val onePart = wide.coalesce(1)
      .agg(SketchFunctions.kmvDistinct(col("v"), k = 128)).collect()(0).getLong(0)
    val manyPart = wide.repartition(32)
      .agg(SketchFunctions.kmvDistinct(col("v"), k = 128)).collect()(0).getLong(0)
    assert(onePart == manyPart) // order statistics are partition-order independent
  }
}
