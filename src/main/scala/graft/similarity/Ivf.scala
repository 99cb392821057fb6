package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.ops.RelationalOps

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nLists` cells; a query
  * probes its `nProbe` nearest cells and scores exactly only inside
  * them — candidate count ≈ corpus × nProbe / nLists.
  *
  * Scale shape: the quantizer trains on a BOUNDED sample solved
  * locally on the driver (the standard IVF recipe — e.g. FAISS trains
  * coarse quantizers on ~10⁵-10⁶ sampled vectors regardless of corpus
  * size); the centroids then ride into the plan — as literal subtrees
  * for small `nLists`, as one broadcast matrix object above
  * [[Ivf.literalPathMaxLists]] (large indexes would break Janino
  * limits as literals) — so cell assignment is a single codegen'd
  * scan either way: no iterative cluster jobs, no shuffle. The probe
  * join shuffles once on cell id
  * (high-cardinality, bounded cells). Unlike hyperplane LSH the cells
  * adapt to the data distribution, so recall is typically higher at
  * equal candidate budgets on clustered embeddings.
  */
object Ivf {

  case class Index(centroids: Array[Array[Float]], assigned: DataFrame)

  /** Above this many centroids, cell assignment and probe ranking
    * switch from per-centroid literal subtrees to the broadcast
    * centroid-matrix expression ([[graft.functions.CentroidTopCells]]).
    * The literal formulation is fully inlined whole-stage codegen —
    * the fastest shape — but its expression tree grows linearly in
    * `nLists` and breaks Janino method-size/constant-pool limits in
    * the thousands; 64 is comfortably inside every JVM limit while
    * covering the small-index regime. Both paths produce identical
    * results (same arithmetic, same lower-cell tie-break; IvfSpec
    * asserts equality), so the switch is invisible to callers.
    */
  val literalPathMaxLists = 64

  /** Nearest-centroid cell id: argmin over dist²(v, c) computed as
    * |c|² − 2·v·c (the |v|² term is constant per row), each dot a
    * fused codegen loop; ties break to the lower cell id via struct
    * ordering. Large indexes take the matrix path — see
    * [[literalPathMaxLists]].
    */
  private def nearestCell(vec: Column, centroids: Array[Array[Float]]): Column = {
    // least() requires >=2 args; a degenerate one-cell index assigns all rows to 0
    if (centroids.length == 1) lit(0)
    else if (centroids.length > literalPathMaxLists)
      graft.functions.CentroidFunctions
        .centroidTopCells(vec, centroids, 1, "l2").getItem(0)
    else {
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        val normSq = c.map(x => x.toDouble * x.toDouble).sum
        struct(
          (VectorFunctions.vecDot(vec, typedLit(c)) * -2.0 + normSq).as("d"),
          lit(i).as("cell"))
      }
      least(scored: _*).getField("cell")
    }
  }

  /** Build the index: deterministic local Lloyd's k-means on a bounded
    * sample, then assign every vector to its nearest centroid (lazy,
    * one scan).
    */
  def build(
      vectors: DataFrame,
      nLists: Int = 16,
      maxTrain: Int = 100000,
      lloydIters: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Index = {
    // Deterministic, unbiased training sample: order by a seeded hash of
    // the vector id, not scan order. `limit(n)` alone returns whichever
    // rows arrive first (first parquet files), which on time- or
    // source-ordered corpora trains the quantizer on one slice of the
    // distribution. Hash-ordering makes the sample a uniform function of
    // the data (TakeOrderedAndProject: per-partition top-k heap, no full
    // sort, no extra shuffle beyond the single-partition gather).
    val sample = vectors
      .select(col(vecCol), xxhash64(col(idCol), lit(0x9e3779b9L)).as("__h"))
      .orderBy(col("__h"))
      .limit(maxTrain)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    val dim = sample.head.length
    val k = math.min(nLists, sample.length)

    // deterministic init: evenly-spaced sample vectors
    var centroids = Array.tabulate(k)(i => sample((i.toLong * sample.length / k).toInt).clone())

    // Lloyd assignment is embarrassingly parallel: chunk the sample
    // across cores, accumulate per-chunk partial sums, merge in chunk
    // order (fixed fp addition order → deterministic across runs).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val nThreads = math.min(Runtime.getRuntime.availableProcessors(), 16).max(1)
    val chunkSize = math.max(1, (sample.length + nThreads - 1) / nThreads)
    val chunks = sample.grouped(chunkSize).toArray

    var iter = 0
    while (iter < lloydIters) {
      val cens = centroids
      val partials = Await.result(
        Future.sequence(chunks.toSeq.map { chunk =>
          Future {
            val sums = Array.fill(k)(new Array[Double](dim))
            val counts = new Array[Long](k)
            chunk.foreach { v =>
              var best = 0; var bestD = Double.MaxValue
              var c = 0
              while (c < k) {
                var d = 0.0; var j = 0
                val cen = cens(c)
                while (j < dim) { val t = v(j) - cen(j); d += t * t; j += 1 }
                if (d < bestD) { bestD = d; best = c }
                c += 1
              }
              counts(best) += 1
              val s = sums(best)
              var j = 0
              while (j < dim) { s(j) += v(j); j += 1 }
            }
            (sums, counts)
          }
        }), Duration.Inf)
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      partials.foreach { case (ps, pc) =>
        var c = 0
        while (c < k) {
          counts(c) += pc(c)
          val s = sums(c); val p = ps(c)
          var j = 0
          while (j < dim) { s(j) += p(j); j += 1 }
          c += 1
        }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty cell: keep old centroid
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
      iter += 1
    }

    val assigned = vectors.select(
      col(idCol).as("id"),
      col(vecCol).as("vec"),
      nearestCell(col(vecCol), centroids).as("cell"))
    Index(centroids, assigned)
  }

  /** Query the index: each query ranks all centroids in one codegen'd
    * expression (sort an nLists-element array of (−cos, cell) structs,
    * keep `nProbe`) — no per-query shuffle — then scores exactly
    * against only those cells' members (one shuffle on cell id).
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
    val nP = math.min(nProbe, index.centroids.length)
    val probeCells =
      if (index.centroids.length > literalPathMaxLists)
        // matrix path: one referenced object, sorted top-nP in the kernel
        graft.functions.CentroidFunctions
          .centroidTopCells(col("q_vec"), index.centroids, nP, "cosine")
      else {
        val ranked = array(index.centroids.zipWithIndex.map { case (c, i) =>
          struct(
            (VectorFunctions.vecCosine(col("q_vec"), typedLit(c)) * -1.0).as("negcos"),
            lit(i).as("cell"))
        }: _*)
        transform(slice(array_sort(ranked), 1, nP), p => p.getField("cell"))
      }
    val probed = q.select(
      col("query_id"), col("q_vec"), explode(probeCells).as("cell"))
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
