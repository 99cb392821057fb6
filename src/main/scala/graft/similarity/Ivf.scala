package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nLists` cells; a query
  * probes its `nProbe` nearest cells and scores exactly only inside
  * them — candidate count ≈ corpus × nProbe / nLists.
  *
  * Scale shape: the quantizer trains on a BOUNDED sample solved
  * locally on the driver (the standard IVF recipe — e.g. FAISS trains
  * coarse quantizers on ~10⁵-10⁶ sampled vectors regardless of corpus
  * size); the centroids then ride into the plan as ONE broadcast
  * matrix object (see the history note on `nearestCell` — the
  * per-centroid literal-tree formulation measured 7-29× slower and
  * hits Janino limits at large nLists), so cell assignment is a
  * single codegen'd scan: no iterative cluster jobs, no shuffle. The
  * probe join shuffles once on cell id
  * (high-cardinality, bounded cells). Unlike hyperplane LSH the cells
  * adapt to the data distribution, so recall is typically higher at
  * equal candidate budgets on clustered embeddings.
  */
object Ivf {

  case class Index(centroids: Array[Array[Float]], assigned: DataFrame)

  /** Nearest-centroid cell id: argmin over dist²(v, c) computed as
    * |c|² − 2·v·c (the |v|² term is constant per row) in the
    * broadcast centroid-matrix kernel
    * ([[graft.functions.CentroidTopCells]]); ties break to the lower
    * cell id.
    *
    * History: earlier rounds built a per-centroid literal tree
    * (`least(struct(d, cell), ...)`) — "fully inlined codegen" on
    * paper, but measured 7× slower at nLists=16 and 29× at 64 (struct
    * allocation + struct-ordering comparisons per candidate per row),
    * and its expression tree breaks Janino limits in the thousands of
    * lists. The matrix kernel wins at EVERY size and has no ceiling,
    * so it is now the only path; the literal formulation survives in
    * IvfSpec as an independent equivalence cross-check (both produce
    * bitwise-identical assignments and probe rankings).
    */
  private def nearestCell(vec: Column, centroids: Array[Array[Float]]): Column =
    if (centroids.length == 1) lit(0)
    else graft.functions.CentroidFunctions
      .centroidTopCells(vec, centroids, 1, "l2").getItem(0)

  /** Deterministic, unbiased training sample: order by a seeded hash of
    * the vector id, not scan order. `limit(n)` alone returns whichever
    * rows arrive first (first parquet files), which on time- or
    * source-ordered corpora trains the quantizer on one slice of the
    * distribution. Hash-ordering makes the sample a uniform function of
    * the data (TakeOrderedAndProject: per-partition top-k heap, no full
    * sort, no extra shuffle beyond the single-partition gather).
    * Shared by [[Ivf.build]], [[Pq.train]] and [[IvfPq.build]] — the
    * composed builders collect it ONCE and pass it down.
    */
  private[similarity] def hashOrderedSample(
      vectors: DataFrame,
      maxTrain: Int,
      idCol: String,
      vecCol: String): Array[Array[Float]] =
    vectors
      .select(col(vecCol), xxhash64(col(idCol), lit(0x9e3779b9L)).as("__h"))
      .orderBy(col("__h"))
      .limit(maxTrain)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)

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
      vecCol: String = "embedding"): Index =
    buildWithSample(
      hashOrderedSample(vectors, maxTrain, idCol, vecCol),
      vectors, nLists, lloydIters, idCol, vecCol)

  private[similarity] def buildWithSample(
      sample: Array[Array[Float]],
      vectors: DataFrame,
      nLists: Int,
      lloydIters: Int,
      idCol: String,
      vecCol: String): Index = {
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

    Index(centroids, assign(centroids, vectors, idCol, vecCol))
  }

  /** Assign vectors to their nearest stored centroid — (id, vec, cell)
    * rows. This is the incremental-ingest path: a NEW batch encodes
    * against an EXISTING quantizer (same broadcast-matrix kernel and
    * evaluation order as [[build]], so batch assignments agree with
    * the corpus's Voronoi boundaries) without retraining or touching
    * already-assigned rows. See [[IndexStore.appendIvfBatch]].
    */
  def assign(
      centroids: Array[Array[Float]],
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    vectors.select(
      col(idCol).as("id"),
      col(vecCol).as("vec"),
      nearestCell(col(vecCol), centroids).as("cell"))

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
      vecCol: String = "embedding",
      eligible: Option[DataFrame] = None): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      Ann.l2Norm(col(vecCol)).as("q_norm"))
    val nP = math.min(nProbe, index.centroids.length)
    val probeCells = graft.functions.CentroidFunctions
      .centroidTopCells(col("q_vec"), index.centroids, nP, "cosine")
    val probed = q.select(
      col("query_id"), col("q_vec"), col("q_norm"), explode(probeCells).as("cell"))
    // exact scoring inside probed cells only (shuffle on cell id);
    // corpus norms project once per row BEFORE the shuffle, query
    // norms once per query before the probe explode (cosinePreNormed)
    // FILTERED search: the metadata predicate's surviving ids
    // semi-join the corpus BEFORE the cell shuffle and scoring — the
    // probe only ever sees eligible vectors, so a selective filter
    // SHRINKS the candidate volume instead of starving a post-filter
    // of the unfiltered top-k (which returns < k rows whenever
    // eligible matches rank below the cut)
    val base = eligible match {
      case Some(e) =>
        val ids = e.select(col(e.columns.head).as("id")).distinct()
        index.assigned.join(ids, Seq("id"), "left_semi")
      case None => index.assigned
    }
    val assigned = base
      .withColumn("c_norm", Ann.l2Norm(col("vec")))
    // with one list `cell` constant-folds and the equi-join key
    // disappears — an unguarded hint would just log a drop warning
    val build =
      if (index.centroids.length > 1) assigned.hint("shuffle_hash") else assigned
    val cand = probed.join(build, Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        Ann.cosinePreNormed(col("q_vec"), col("vec"), col("q_norm"), col("c_norm"))
          .as("cos"))
      .groupBy("query_id", "neighbor_id")
      .agg(max("cos").as("cos")) // a pair may appear via several probes
    // candidate volume per query ≈ |C|·nProbe/nLists — corpus-
    // proportional, so reduce with map-side k-heaps, not a window
    RelationalOps.topKPerGroupPartial(
      cand, Seq("query_id"),
      score = col("cos"), id = col("neighbor_id"),
      k = k, scoreAscending = false,
      idName = "neighbor_id", scoreName = "cos")
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}
