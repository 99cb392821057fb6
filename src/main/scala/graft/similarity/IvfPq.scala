package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{CentroidFunctions, PqFunctions}
import graft.ops.RelationalOps

/** IVF-PQ — the composed production index (the FAISS `IVFx,PQy`
  * shape): an IVF coarse quantizer prunes the search to `nProbe`
  * cells, and within cells vectors are stored as PQ codes of their
  * RESIDUAL against the cell centroid. Residuals are far more
  * concentrated than raw vectors, so the same code budget quantizes
  * finer; the index holds (cell id + m code bytes) per vector and a
  * query touches only probed cells, by ADC table lookups.
  *
  * Plan shape at scale: the per-query probe set (queries × nProbe
  * rows, each with one m·k LUT) BROADCASTS; the encoded corpus joins
  * on cell id (each corpus vector lives in exactly one cell, so no
  * candidate dedup is needed), scores with m table reads per row, and
  * only the ADC top k×refineFactor re-attach full vectors for the
  * exact re-rank. One shuffle total (the candidate top-k), zero
  * full-precision reads outside the refine set.
  */
object IvfPq {

  /** `encoded` is the (id, cell, codes) index frame — LAZY by design
    * (composes into one plan for single-shot jobs). A deployment
    * serving many query batches should materialize it once
    * (`encoded.persist()` or write to the warehouse and read back):
    * measured at 40k vectors, encoding costs ~0.3 s of the ~10 s
    * first query, and subsequent queries drop to ~1.4 s warm.
    */
  case class Index(
      centroids: Array[Array[Float]],
      cb: Pq.Codebook,
      encoded: DataFrame)

  /** Build: IVF coarse centroids (hash-ordered sample, deterministic
    * Lloyd's — [[Ivf.build]]), then per-subspace residual codebooks on
    * the same sample, then one scan encoding every vector as
    * (cell, residual codes).
    */
  def build(
      vectors: DataFrame,
      nLists: Int = 16,
      m: Int = 8,
      k: Int = 16,
      maxTrain: Int = 100000,
      lloydIters: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Index = {
    // ONE sample collect feeds both the coarse quantizer and the
    // residual codebooks (a second orderBy+limit+collect would repeat
    // the corpus-side gather — the expensive part of build at scale)
    val sample = Ivf.hashOrderedSample(vectors, maxTrain, idCol, vecCol)
    val ivf = Ivf.buildWithSample(sample, vectors, nLists, lloydIters, idCol, vecCol)
    val cens = ivf.centroids

    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    // residuals assigned by the SAME kernel (and the same |c|² − 2·v·c
    // evaluation order) the corpus-side encoding uses — a hand-rolled
    // Σ(v−c)² loop can disagree on Voronoi boundaries and train the
    // codebook against a different cell than encoding subtracts
    val assigner = graft.functions.CentroidTopCells(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      cens, 1, useCosine = false)
    val residuals = sample.map { v =>
      val best = assigner.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v.map(x => x: Any)))
        .getInt(0)
      val r = new Array[Float](dim)
      var j = 0
      while (j < dim) { r(j) = v(j) - cens(best)(j); j += 1 }
      r
    }

    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val books = Await.result(
      Future.sequence((0 until m).map { s =>
        Future {
          val sub = residuals.map(r => java.util.Arrays.copyOfRange(r, s * dsub, (s + 1) * dsub))
          Pq.lloyd(sub, math.min(k, sub.length), lloydIters)
        }
      }), Duration.Inf)
    val cb = Pq.Codebook(books.toArray)

    Index(cens, cb, encode(cens, cb, vectors, idCol, vecCol))
  }

  /** Encode vectors against EXISTING quantizers — (id, cell, codes)
    * rows: nearest-cell assignment (same kernel and evaluation order
    * as training), residual against the cell centroid, PQ codes. The
    * incremental-ingest path: a new batch encodes without retraining
    * or re-encoding the corpus (see [[IndexStore.appendIvfPqBatch]]).
    */
  def encode(
      centroids: Array[Array[Float]],
      cb: Pq.Codebook,
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    Ivf.assign(centroids, vectors, idCol, vecCol).select(
      col("id"),
      col("cell"),
      PqFunctions.pqEncode(
        CentroidFunctions.centroidResidual(col("vec"), col("cell"), centroids),
        cb.codebooks).as("codes"))

  /** Per-vector quantization error against EXISTING quantizers: the
    * exact squared L2 between a vector's residual and its PQ
    * reconstruction, computed as the ADC distance of the residual to
    * its OWN codes — the same LUT kernel queries run, so the reported
    * error is exactly the distortion those queries see. One scan, all
    * codegen'd expressions. Output: (id, cell, qerr).
    */
  def quantizationError(
      centroids: Array[Array[Float]],
      cb: Pq.Codebook,
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    Ivf.assign(centroids, vectors, idCol, vecCol)
      .select(col("id"), col("cell"),
        CentroidFunctions.centroidResidual(col("vec"), col("cell"), centroids).as("__r"))
      .select(col("id"), col("cell"),
        PqFunctions.pqAdcDist(
          PqFunctions.pqLut(col("__r"), cb.codebooks),
          PqFunctions.pqEncode(col("__r"), cb.codebooks),
          cb.k).as("qerr"))

  /** Per-cell quantization-error rollup — (cell, n, avg_qerr,
    * max_qerr): the distribution-fit observability for a stored index.
    * Snapshot it at build time as the baseline; rising per-cell error
    * on later batches (see [[IndexStore.driftReport]]) means the
    * frozen quantizers no longer fit the incoming data — the retrain
    * signal the incremental ingest path otherwise lacks.
    */
  def cellErrorStats(
      centroids: Array[Array[Float]],
      cb: Pq.Codebook,
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    quantizationError(centroids, cb, vectors, idCol, vecCol)
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), avg("qerr").as("avg_qerr"), max("qerr").as("max_qerr"))

  /** Query: probe `nProbe` nearest cells per query (L2, matching the
    * assignment metric), one residual LUT per (query, cell), ADC over
    * the probed cells' codes, exact cosine refine of the ADC top
    * k×refineFactor. Output schema matches [[Ann.bruteForceTopK]].
    */
  def topK(
      index: Index,
      vectors: DataFrame,
      queries: DataFrame,
      kNeighbors: Int,
      nProbe: Int = 4,
      refineFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val nP = math.min(nProbe, index.centroids.length)
    val probed = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(CentroidFunctions.centroidTopCells(
        col(vecCol), index.centroids, nP, "l2")).as("cell"))
    val withLut = probed.select(
      col("query_id"), col("cell"),
      PqFunctions.pqLut(
        CentroidFunctions.centroidResidual(col("q_vec"), col("cell"), index.centroids),
        index.cb.codebooks).as("__lut"))
    // each corpus vector lives in exactly one cell → no pair dedup
    val cand = broadcast(withLut)
      .join(index.encoded, Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        PqFunctions.pqAdcDist(col("__lut"), col("codes"), index.cb.k).as("adc"))
    // a query's probed-cell candidate volume is ≈ |C|·nProbe/nLists —
    // corpus-proportional, so the reduction gets the same map-side
    // k-heap treatment as the full ADC scan in Pq.adcTopK
    val adcTop = RelationalOps.topKPerGroupPartial(
      cand, Seq("query_id"),
      score = col("adc"), id = col("neighbor_id"),
      k = kNeighbors * refineFactor, scoreAscending = true,
      idName = "neighbor_id", scoreName = "adc")
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      Ann.l2Norm(col(vecCol)).as("q_norm")))
    // bounded candidate set broadcasts; the full-precision corpus is
    // probed in place and never shuffles (same shape as Pq.topK)
    val scored = vectors
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        Ann.l2Norm(col(vecCol)).as("c_norm"))
      .join(broadcast(adcTop.join(qv, Seq("query_id"))), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Ann.cosinePreNormed(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
          .as("cos"))
    RelationalOps.topKPerGroupPartial(
      scored, Seq("query_id"),
      score = col("cos"), id = col("neighbor_id"),
      k = kNeighbors, scoreAscending = false,
      idName = "neighbor_id", scoreName = "cos")
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}
