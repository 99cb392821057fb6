package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHitterAggregatesSpec extends SparkSpec {
  import HeavyHitterFunctions._

  private lazy val li = graft.Tables.lineitem(spark, sf("lineitem"))

  test("exact regime: distinct values under k reproduce GROUP BY counts exactly") {
    // suppliers per return flag: far fewer than k=64 distinct at sf0.001
    val got = li.groupBy("l_returnflag")
      .agg(mgSketch(col("l_suppkey"), k = 64).as("hh"))
      .select(col("l_returnflag"),
        mgTopKeys(col("hh"), k = 64, j = 5).as("keys"),
        mgTopCounts(col("hh"), k = 64, j = 5).as("counts"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getSeq[Long](2))).toMap
    val truth = li.groupBy(col("l_returnflag"), col("l_suppkey").cast("string").as("sk"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getString(0))
      .map { case (flag, rows) =>
        val ranked = rows.map(r => (r.getString(1), r.getLong(2)))
          .sortBy { case (sk, c) => (-c, sk) }.take(5)
        flag -> (ranked.map(_._1).toSeq, ranked.map(_._2).toSeq)
      }
    assert(got == truth)
  }

  test("merge path: per-partition sketches unioned equal the one-shot sketch (exact regime)") {
    val perPart = li.repartition(8)
      .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(4)).as("slice"))
      .agg(mgSketch(col("l_suppkey"), k = 64).as("hh"))
      .groupBy("l_returnflag")
      .agg(mgUnion(col("hh"), k = 64).as("hh"))
      .select(col("l_returnflag"), mgTopKeys(col("hh"), 64, 5).as("keys"),
        mgTopCounts(col("hh"), 64, 5).as("counts"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getSeq[Long](2))).toMap
    val oneShot = li.groupBy("l_returnflag")
      .agg(mgSketch(col("l_suppkey"), k = 64).as("hh"))
      .select(col("l_returnflag"), mgTopKeys(col("hh"), 64, 5).as("keys"),
        mgTopCounts(col("hh"), 64, 5).as("counts"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getSeq[Long](2))).toMap
    assert(perPart == oneShot)
  }

  test("saturated regime honors the Misra-Gries bound: no overcount, undercount <= N/(k+1), true heavy hitters survive") {
    val k = 8
    // orderkeys: many distinct, skewed by construction — one hot key
    // repeated via a cross join of a small multiplier
    import spark.implicits._
    val hot = Seq.fill(500)("HOT").toDF("v")
    val tail = (1 to 400).map(i => s"t$i").toDF("v")
    val data = hot.unionAll(tail)
    val n = data.count()
    val est = data.agg(mgSketch(col("v"), k).as("hh"))
      .select(mgTopKeys(col("hh"), k, k).as("keys"), mgTopCounts(col("hh"), k, k).as("counts"))
      .collect().map(r => r.getSeq[String](0).zip(r.getSeq[Long](1))).head.toMap
    val truth = data.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every reported count: true - N/(k+1) <= est <= true
    est.foreach { case (key, c) =>
      val t = truth.getOrElse(key, 0L)
      assert(c <= t, s"overcount of $key: $c > $t")
      assert(t - c <= n / (k + 1), s"undercount of $key beyond bound")
    }
    // any key with true count > N/(k+1) is guaranteed present
    truth.filter(_._2 > n / (k + 1)).keys.foreach { key =>
      assert(est.contains(key), s"true heavy hitter $key missing")
    }
  }

  test("nulls are skipped; empty input yields an empty sketch") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("v")
    val m = df.agg(mgSketch(col("v"), 4).as("hh"))
      .select(mgTopKeys(col("hh"), 4, 4).as("k"), mgTopCounts(col("hh"), 4, 4).as("c"))
      .head()
    assert(m.getSeq[String](0) == Seq("a", "b"))
    assert(m.getSeq[Long](1) == Seq(2L, 1L))
    val empty = df.filter(col("v") === "zzz")
      .agg(mgSketch(col("v"), 4).as("hh"))
      .select(mgTopKeys(col("hh"), 4, 4).as("k")).head()
    assert(empty.getSeq[String](0).isEmpty)
  }
}
