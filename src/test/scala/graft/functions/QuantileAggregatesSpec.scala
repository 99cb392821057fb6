package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileAggregatesSpec extends SparkSpec {
  import QuantileFunctions._

  private lazy val li = graft.Tables.lineitem(spark, sf("lineitem"))

  private def exactRank(vals: Seq[Double], q: Double): Double = {
    val s = vals.sorted
    s((math.max(1L, math.ceil(q * s.length).toLong) - 1).toInt)
  }

  test("exact regime: distinct values under maxBins give exact rank quantiles") {
    val got = li.groupBy("l_returnflag")
      .agg(qSketch(col("l_quantity"), maxBins = 64).as("qs"))
      .select(col("l_returnflag"),
        qQuantile(col("qs"), 0.5, 64).as("p50"),
        qQuantile(col("qs"), 0.9, 64).as("p90"),
        qQuantile(col("qs"), 1.0, 64).as("p100"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byFlag = li.select("l_returnflag", "l_quantity").collect()
      .groupBy(_.getString(0)).map { case (f, rs) => f -> rs.map(_.getDouble(1)).toSeq }
    byFlag.foreach { case (f, vals) =>
      assert(got(f) == ((exactRank(vals, 0.5), exactRank(vals, 0.9), vals.max)))
    }
  }

  test("merge path: per-slice sketches unioned equal the one-shot sketch (exact regime)") {
    val sliced = li.groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(4)).as("sl"))
      .agg(qSketch(col("l_quantity"), 64).as("qs"))
      .groupBy("l_returnflag").agg(qUnion(col("qs"), 64).as("qs"))
      .select(col("l_returnflag"), qQuantile(col("qs"), 0.5, 64).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val oneShot = li.groupBy("l_returnflag")
      .agg(qSketch(col("l_quantity"), 64).as("qs"))
      .select(col("l_returnflag"), qQuantile(col("qs"), 0.5, 64).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sliced == oneShot)
  }

  test("saturated regime: log-binned lower bound never exceeds the true quantile, bounded ratio below") {
    // thousands of distinct prices force coarsening at maxBins=256
    val vals = li.select("l_extendedprice").collect().map(_.getDouble(0)).toSeq
    assert(vals.distinct.length > 256)
    val got = li.agg(qSketch(col("l_extendedprice"), 256).as("qs"))
      .select(qQuantile(col("qs"), 0.5, 256).as("p50"),
        qQuantile(col("qs"), 0.95, 256).as("p95"))
      .head()
    Seq(got.getDouble(0) -> 0.5, got.getDouble(1) -> 0.95).foreach { case (est, q) =>
      val truth = exactRank(vals, q)
      assert(est <= truth, s"bin lower bound above truth at q=$q: $est > $truth")
      assert(est >= truth * 0.70, s"est too coarse at q=$q: $est vs $truth")
    }
  }

  test("signs, zero, and nulls: total order respected, nulls skipped") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(-5.0), Some(-1.0), Some(0.0), Some(2.5),
      Some(10.0), None).toDF("v")
    val r = df.agg(qSketch(col("v"), 16).as("qs"))
      .select(
        qQuantile(col("qs"), 0.2, 16).as("q20"),
        qQuantile(col("qs"), 0.4, 16).as("q40"),
        qQuantile(col("qs"), 0.6, 16).as("q60"),
        qQuantile(col("qs"), 1.0, 16).as("q100"))
      .head()
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((-5.0, -1.0, 0.0, 10.0)))
    val empty = df.filter(col("v") > 100)
      .agg(qSketch(col("v"), 16).as("qs"))
      .select(qQuantile(col("qs"), 0.5, 16).as("m")).head()
    assert(empty.isNullAt(0))
  }
}
