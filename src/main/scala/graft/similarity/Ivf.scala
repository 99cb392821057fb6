package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nLists` cells; a query
  * probes its `nProbe` nearest cells and scores exactly only inside
  * them — candidate count ≈ corpus × nProbe / nLists.
  *
  * Scale shape: training samples the corpus (k-means on a bounded
  * sample); assignment is one scan; the probe join shuffles on
  * cell id (high cardinality, bounded cells). Unlike hyperplane LSH
  * the cells adapt to the data distribution, so recall is typically
  * higher at equal candidate budgets on clustered embeddings.
  */
object Ivf {

  case class Index(centroids: DataFrame, assigned: DataFrame)

  /** Build the index: fit k-means (fixed seed — deterministic) on a
    * sample, assign every vector to its nearest centroid.
    */
  def build(
      vectors: DataFrame,
      nLists: Int = 16,
      sampleFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Index = {
    val spark = vectors.sparkSession
    val asVec = vectors.select(
      col(idCol).as("id"),
      col(vecCol).as("vec"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val train =
      if (sampleFraction >= 1.0) asVec
      else asVec.sample(withReplacement = false, sampleFraction, seed = 42L)
    val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(20)
      .fit(train.select("features"))
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat))
      }.toSeq).toDF("cell", "centroid")
    val assigned = model.transform(asVec)
      .select(col("id"), col("vec"), col("prediction").as("cell"))
    Index(centroids, assigned)
  }

  /** Query the index: for each query vector, find its `nProbe`
    * nearest cells (broadcast centroids — nLists is small by design),
    * then exact cosine against only those cells' members.
    * Output schema matches Ann.bruteForceTopK.
    */
  def topK(
      index: Index,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    // rank cells per query by centroid distance; keep nProbe
    val scoredCells = q.join(broadcast(index.centroids))
      .select(
        col("query_id"), col("q_vec"), col("cell"),
        Ann.cosine(col("q_vec"), col("centroid")).as("ccos"))
    val probed = RelationalOps.topKPerGroup(
      scoredCells, Seq("query_id"),
      Seq(col("ccos").desc, col("cell").asc), nProbe)
      .select("query_id", "q_vec", "cell")
    // exact scoring inside probed cells only (shuffle on cell id)
    val cand = probed.join(index.assigned.hint("shuffle_hash"), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        Ann.cosine(col("q_vec"), col("vec")).as("cos"))
      .groupBy("query_id", "neighbor_id")
      .agg(max("cos").as("cos")) // a pair may appear via several probes
    RelationalOps.topKPerGroup(
      cand, Seq("query_id"),
      Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}
