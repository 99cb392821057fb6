package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemDedupSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, sf("embeddings"))

  private def fixedCentroids(k: Int): Array[Array[Float]] =
    emb.filter(col("vec_id") < k).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)

  test("pairs are intra-cluster, ordered, and above threshold") {
    val cents = fixedCentroids(4)
    val pairs = SemDedup.clusterDupPairs(emb, cents, threshold = 0.3).collect()
    assert(pairs.nonEmpty)
    val cellOf = Ivf.assign(cents, emb).select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.foreach { r =>
      val (cell, a, b, cos) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(a < b)
      assert(cos >= 0.3)
      assert(cellOf(a) == cell && cellOf(b) == cell)
    }
  }

  test("dedup keeps exactly one member per duplicate group — the least centroid-similar") {
    val cents = fixedCentroids(4)
    val decided = SemDedup.dedup(emb, cents, threshold = 0.3)
    val keptSet = decided.filter(col("kept")).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val labels = graft.dedup.Dedup.componentLabels(
      SemDedup.clusterDupPairs(emb, cents, threshold = 0.3).select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every grouped component keeps exactly one member
    labels.groupBy(_._2).foreach { case (_, members) =>
      assert(members.keys.count(keptSet) == 1)
    }
    // singletons all survive
    emb.select("vec_id").collect().map(_.getLong(0))
      .filterNot(labels.contains).foreach(id => assert(keptSet(id)))
    // the keeper minimizes (centroid similarity, id) within its group
    val csim = {
      import spark.implicits._
      val cdf = cents.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
        .toDF("cell", "cvec")
      Ivf.assign(cents, emb).join(cdf, Seq("cell"))
        .select(col("id"), Ann.cosine(col("vec"), col("cvec")).as("csim"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    labels.groupBy(_._2).foreach { case (_, members) =>
      val expect = members.keys.minBy(id => (csim(id), id))
      assert(members.keys.filter(keptSet).toSeq == Seq(expect))
    }
  }

  test("trained-centroid (Ivf.build) production path and sub-bucketing cap stay sound") {
    val trained = Ivf.build(emb, nLists = 8).centroids
    val decided = SemDedup.dedup(emb, trained, threshold = 0.3)
    val n = emb.count()
    val kept = decided.filter(col("kept")).count()
    assert(decided.count() == n)
    assert(kept >= 1 && kept <= n)
    // a tiny cap sub-buckets every cluster yet still yields one keeper
    // per (sub-bucketed) component and keeps all singletons
    val capped = SemDedup.dedup(emb, trained, threshold = 0.3, maxClusterSize = 8)
    assert(capped.count() == n)
    assert(capped.filter(col("kept")).count() >= kept)
    // impossible threshold: nothing groups, everything survives
    val all = SemDedup.dedup(emb, trained, threshold = 1.5)
    assert(all.filter(col("kept")).count() == n)
  }

  test("pair generation carries no cartesian product — the cell/sub equi-key reaches the join") {
    val cents = fixedCentroids(4)
    val plan = SemDedup.clusterDupPairs(emb, cents, threshold = 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
