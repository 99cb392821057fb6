package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cluster-balanced sampling ([[TrainingDataPipeline
  * .clusterBalancedSample]]): per-cell quota honored, hash-mode
  * layout independence, central/edge ordering semantics, and the
  * production path (Ivf-trained centroids) covering every cluster.
  */
class ClusterSampleSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, sf("embeddings"))

  private def injected(n: Int): Array[Array[Float]] =
    emb.filter(col("vec_id") < n).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)

  test("quota: at most perCluster rows per cell; cells with fewer keep all") {
    val cents = injected(8)
    val got = TrainingDataPipeline
      .clusterBalancedSample(emb, cents, perCluster = 5)
      .localCheckpoint()
    val sizes = graft.similarity.Ivf.assign(cents, emb)
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kept = got.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    kept.foreach { case (cell, n) =>
      assert(n == math.min(5L, sizes(cell)),
        s"cell $cell kept $n of ${sizes(cell)}")
    }
    // selection is a subset of the corpus ids
    assert(got.join(emb, Seq("vec_id"), "left_anti").count() == 0)
  }

  test("hash mode is layout-independent (same sample after repartition)") {
    val cents = injected(8)
    val a = TrainingDataPipeline
      .clusterBalancedSample(emb, cents, 3).collect().toSet
    val b = TrainingDataPipeline
      .clusterBalancedSample(emb.repartition(13), cents, 3).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("central keeps higher own-centroid cosine than edge; both honor ties") {
    val cents = injected(8)
    val assigned = graft.similarity.Ivf.assign(cents, emb)
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "cvec")
    val sims = assigned.join(broadcast(cdf), Seq("cell"))
      .withColumn("csim",
        graft.similarity.Ann.cosine(col("vec"), col("cvec")))
      .select(col("id").as("vec_id"), col("cell"), col("csim"))
    def meanSim(mode: String): Double =
      TrainingDataPipeline.clusterBalancedSample(emb, cents, 5, mode)
        .join(sims, Seq("vec_id", "cell"))
        .agg(avg("csim")).head().getDouble(0)
    assert(meanSim("central") > meanSim("edge"))
    intercept[IllegalArgumentException] {
      TrainingDataPipeline.clusterBalancedSample(emb, injected(4), 2, "nope")
    }
  }

  test("production path: Ivf-trained centroids, every non-empty cluster sampled") {
    val idx = graft.similarity.Ivf.build(emb, nLists = 16)
    val got = TrainingDataPipeline
      .clusterBalancedSample(emb, idx.centroids, perCluster = 4)
      .localCheckpoint()
    val nonEmpty = graft.similarity.Ivf.assign(idx.centroids, emb)
      .select("cell").distinct().count()
    assert(got.select("cell").distinct().count() == nonEmpty)
    assert(got.groupBy("cell").count()
      .filter(col("count") > 4).count() == 0)
  }
}
