package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** SemDeDup — semantic deduplication via embedding clustering (Abbas
  * et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): k-means-cluster the embedding
  * space, then compare pairs ONLY within a cluster. The sixth dedup
  * family: exact, minhash, simhash, span and embedding-LSH dedup key
  * on content; this one keys on MEANING — paraphrases and
  * translations that share no n-gram still collide in embedding
  * space, and the cluster prune turns the O(N²) all-pairs cosine scan
  * into Σ|cluster|² ≈ N²/k work spread across k independent tasks.
  *
  * Scale shape (the 100 TB axes):
  *  - assignment is the broadcast centroid-matrix kernel
  *    ([[graft.functions.CentroidTopCells]]) — a map, no shuffle;
  *  - pair generation shuffles each row ONCE keyed by (cell, sub) —
  *    embeddings travel once per join side, never per pair, and the
  *    pair stream is pipelined into the cosine filter so only
  *    (id, id, cos) survivors materialize;
  *  - clusters above `maxClusterSize` sub-bucket by a deterministic
  *    id-hash (the LSH hot-bucket discipline): per-task pair work is
  *    capped at maxClusterSize², at the documented cost of missing
  *    cross-sub-bucket pairs in degenerate clusters. Pick k so typical
  *    clusters sit well under the cap (the paper's regime: N/k ≈ 10⁴);
  *  - duplicate groups close over [[Dedup.componentLabels]] — edges
  *    are intra-cluster, so components are too, and the fixpoint
  *    converges in O(log diameter) rounds on a contracting edge set.
  */
object SemDedup {

  /** Intra-cluster near-duplicate pairs: (cell, id_a, id_b, cos) with
    * id_a < id_b and cos ≥ `threshold`, under the supplied (frozen)
    * centroids — the same quantizer-injection seam as
    * [[IndexStore]]/[[Ivf.assign]], which is also what makes the
    * decision ORACLE-CHECKABLE: with deterministic centroids the whole
    * pipeline is pure DataFrame algebra.
    */
  def clusterDupPairs(
      vectors: DataFrame,
      centroids: Array[Array[Float]],
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxClusterSize: Int = 4096): DataFrame = {
    require(maxClusterSize >= 2, s"maxClusterSize must be >= 2, got $maxClusterSize")
    val assigned = Ivf.assign(centroids, vectors, idCol, vecCol)
      .withColumn("norm", Ann.l2Norm(col("vec")))
    // per-cell sizes are ≤ k rows — genuinely bounded, broadcast-safe
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("__n"))
    val sub = assigned.join(broadcast(sizes), Seq("cell"))
      .withColumn("__nsub",
        ceil(col("__n").cast("double") / maxClusterSize).cast("int"))
      .withColumn("sub",
        when(col("__nsub") <= 1, lit(0))
          .otherwise(pmod(xxhash64(col("id")), col("__nsub")).cast("int")))
      .select("cell", "sub", "id", "vec", "norm")
    val a = sub.select(col("cell"), col("sub"), col("id").as("id_a"),
      col("vec").as("v_a"), col("norm").as("n_a"))
    val b = sub.select(col("cell"), col("sub"), col("id").as("id_b"),
      col("vec").as("v_b"), col("norm").as("n_b"))
    a.join(b, Seq("cell", "sub"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cell"), col("id_a"), col("id_b"),
        Ann.cosinePreNormed(col("v_a"), col("v_b"), col("n_a"), col("n_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The SemDeDup decision over every vector: (idCol, cell, kept).
    * Duplicate groups are connected components of the intra-cluster
    * cosine graph; each group keeps the member LEAST similar to its
    * cluster centroid (the paper's rule — prune the prototypical core,
    * keep the informative edge example), ties to the lower id.
    * Singletons are kept. Set `keepLowCentroidSim = false` for the
    * simpler keep-min-id rule (the discipline every other dedup family
    * uses).
    */
  def dedup(
      vectors: DataFrame,
      centroids: Array[Array[Float]],
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxClusterSize: Int = 4096,
      keepLowCentroidSim: Boolean = true): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val assigned = Ivf.assign(centroids, vectors, idCol, vecCol)
    val withSim =
      if (!keepLowCentroidSim) assigned.withColumn("csim", lit(0.0))
      else {
        // k centroid rows — a broadcast dim table by construction
        val cents = centroids.zipWithIndex.toSeq
          .map { case (v, i) => (i, v.toSeq) }.toDF("cell", "cvec")
        assigned.join(broadcast(cents), Seq("cell"))
          .withColumn("csim", Ann.cosine(col("vec"), col("cvec")))
          .drop("cvec")
      }
    val pairs = clusterDupPairs(
      vectors, centroids, threshold, idCol, vecCol, maxClusterSize)
    val labels = Dedup.componentLabels(pairs.select("id_a", "id_b"))
    val keepPerGroup = withSim
      .join(labels, withSim("id") === labels("node"))
      .groupBy(col("label"))
      .agg(min(struct(col("csim"), col("id"))).as("k"))
      .select(col("k.id").as("keep_id"))
    withSim
      .join(labels.select(col("node").as("id"), lit(true).as("__grouped")),
        Seq("id"), "left")
      .join(keepPerGroup.withColumn("__keep", lit(true)),
        col("id") === col("keep_id"), "left")
      .select(col("id").as(idCol), col("cell"),
        (col("__grouped").isNull || col("__keep").isNotNull).as("kept"))
  }
}
