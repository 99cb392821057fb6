package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PqFunctions
import graft.ops.RelationalOps

/** Product-quantization ANN (Jégou et al., TPAMI 2011) — the
  * memory-bounded member of the ANN family (brute force = exact
  * baseline, hyperplane LSH and IVF = candidate-pruning paths, PQ =
  * compressed-scan path):
  *
  *  - train: per-subspace k-means codebooks on a bounded, hash-ordered
  *    driver sample (the same recipe as [[Ivf.build]] — FAISS trains
  *    PQ codebooks on ~10⁵ sampled vectors regardless of corpus size);
  *  - encode: every corpus vector → `m` code BYTES (one codegen'd
  *    scan; at dim=64/m=16 the stored index is 16 B/vector vs 256 B of
  *    floats — the 100 TB knob);
  *  - query: per query ONE lookup table (m·k subspace distances), then
  *    every corpus code scores with m table reads — an asymmetric
  *    distance computation (ADC) scan that never touches the original
  *    vectors;
  *  - refine: ADC keeps `k × refineFactor` candidates, exact cosine
  *    re-ranks only those (vectors re-attach by id, same join-back
  *    shape as LSH verify) — recall approaches brute force while the
  *    full-precision reads stay O(queries × k × refineFactor).
  *
  * Queries broadcast (bounded query set, like
  * [[Ann.bruteForceTopK]]); the encoded corpus streams. Deterministic
  * end to end: hash-ordered sample, evenly-spaced init, fixed merge
  * order, lower-index tie-breaks.
  */
object Pq {

  case class Codebook(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.map(_.length).max
    def dsub: Int = codebooks(0)(0).length
  }

  /** Train per-subspace codebooks: deterministic local Lloyd's on a
    * hash-ordered sample; subspaces train independently (and in
    * parallel on driver cores).
    */
  def train(
      vectors: DataFrame,
      m: Int = 8,
      k: Int = 16,
      maxTrain: Int = 100000,
      lloydIters: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Codebook = {
    require(k >= 1 && k <= 256, "PQ codes are bytes: k must be in [1, 256]")
    val sample = Ivf.hashOrderedSample(vectors, maxTrain, idCol, vecCol)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m

    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val books = Await.result(
      Future.sequence((0 until m).map { s =>
        Future {
          val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
          lloyd(sub, math.min(k, sub.length), lloydIters)
        }
      }), Duration.Inf)
    Codebook(books.toArray)
  }

  /** Sequential Lloyd's over one subspace — deterministic: evenly-
    * spaced init, fixed scan order, empty cells keep their centroid.
    */
  private[similarity] def lloyd(points: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val dim = points.head.length
    var cens = Array.tabulate(k)(i => points((i.toLong * points.length / k).toInt).clone())
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          val cen = cens(c)
          while (j < dim) { val t = p(j) - cen(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val sArr = sums(best)
        var j = 0
        while (j < dim) { sArr(j) += p(j); j += 1 }
      }
      cens = Array.tabulate(k) { c =>
        if (counts(c) == 0) cens(c)
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
      iter += 1
    }
    cens
  }

  /** Encode the corpus: (id, codes binary) — one codegen'd scan. */
  def encode(
      cb: Codebook,
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    vectors.select(
      col(idCol).as("id"),
      PqFunctions.pqEncode(col(vecCol), cb.codebooks).as("codes"))

  /** Pure ADC top-k: (query_id, rank, neighbor_id, adc_dist) — the
    * compressed scan alone, no full-precision reads. Ranks by
    * approximate squared L2; ties to the lower neighbor id.
    */
  def adcTopK(
      cb: Codebook,
      vectors: DataFrame,
      queries: DataFrame,
      kNeighbors: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val codes = encode(cb, vectors, idCol, vecCol)
    val q = broadcast(queries.select(
      col(idCol).as("query_id"),
      PqFunctions.pqLut(col(vecCol), cb.codebooks).as("__lut")))
    val scored = codes
      .join(q, col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        PqFunctions.pqAdcDist(col("__lut"), col("codes"), cb.k).as("adc_dist"))
    // map-side partial k-heaps: the compressed scan is PQ's 100 TB
    // pitch, and this keeps the REDUCTION compressed too — the shuffle
    // carries |Q|·k·partitions heap entries, not the |Q|·|C| scored
    // stream a row_number window would move (and single-task sort)
    RelationalOps.topKPerGroupPartial(
      scored, Seq("query_id"),
      score = col("adc_dist"), id = col("neighbor_id"),
      k = kNeighbors, scoreAscending = true,
      idName = "neighbor_id", scoreName = "adc_dist")
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        col("adc_dist"))
  }

  /** ADC + exact refine: ADC keeps `kNeighbors × refineFactor`
    * candidates per query, full-precision cosine re-ranks only those.
    * Output schema matches [[Ann.bruteForceTopK]].
    */
  def topK(
      cb: Codebook,
      vectors: DataFrame,
      queries: DataFrame,
      kNeighbors: Int,
      refineFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cand = adcTopK(cb, vectors, queries, kNeighbors * refineFactor, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      Ann.l2Norm(col(vecCol)).as("q_norm")))
    // the candidate set is bounded (queries × k × refineFactor) — it
    // BROADCASTS against the corpus, so the full-precision vectors are
    // probed in place and never shuffle
    val scored = vectors
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        Ann.l2Norm(col(vecCol)).as("c_norm"))
      .join(broadcast(cand.join(qv, Seq("query_id"))), Seq("neighbor_id"))
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
