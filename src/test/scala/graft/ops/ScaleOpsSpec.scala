package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-path mechanics: salted skew joins are semantics-preserving,
  * and bucketed tables co-locate joins (no shuffle on either side).
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on skewed data") {
    // heavily skewed: 90% of left rows share one key
    val left = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("k", "lv")
    val right = Seq(("hot", 1.0), ("k950", 2.0), ("miss", 3.0)).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).collect().map(_.toString).sorted.toSeq
    val salted = RelationalOps.saltedEquiJoin(left, right, Seq("k"), saltFactor = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    // left join too (unmatched rows keep null right side)
    val plainL = left.join(right, Seq("k"), "left").count()
    val saltedL = RelationalOps.saltedEquiJoin(left, right, Seq("k"), "left", 4).count()
    assert(saltedL == plainL)
  }

  test("bloomAntiJoinNew equals plain antiJoinNew (nulls included)") {
    val incoming = Seq(("a", Some(1.0)), ("b", None), ("c", Some(2.0)), ("d", Some(9.0)))
      .toDF("k1", "k2")
    val existing = Seq(("a", Some(1.0)), ("b", Option.empty[Double])).toDF("k1", "k2")
    val plain = RelationalOps.antiJoinNew(incoming, existing, Seq("k1", "k2"))
      .collect().map(_.toString).sorted.toSeq
    val bloom = RelationalOps.bloomAntiJoinNew(incoming, existing, Seq("k1", "k2"),
      expectedItems = 100)
      .collect().map(_.toString).sorted.toSeq
    assert(bloom == plain)
    // larger randomized check against the testdata
    val inc = graft.Tables.customer(spark, sf("")).select("c_custkey", "c_name")
    val ex = inc.filter(col("c_custkey") % 3 === 0)
    val a = RelationalOps.antiJoinNew(inc, ex, Seq("c_custkey", "c_name")).count()
    val b = RelationalOps.bloomAntiJoinNew(inc, ex, Seq("c_custkey", "c_name"),
      expectedItems = 1000).count()
    assert(a == b)
  }

  test("partitioned writes prune partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_p"
    graft.Tables.events(spark, sf("events"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // only the click partition's rows are read
    val expected = graft.Tables.events(spark, sf("events"))
      .filter(col("event_type") === "click").count()
    assert(read.count() == expected)
  }

  test("bucketed tables join without exchanges on either side") {
    val li = graft.Tables.lineitem(spark, sf("lineitem"))
      .select("l_orderkey", "l_quantity")
    val o = graft.Tables.orders(spark, sf("orders"))
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").saveAsTable("o_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // and it still computes the right thing
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
