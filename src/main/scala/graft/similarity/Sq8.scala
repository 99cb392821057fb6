package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.RelationalOps

/** Int8 scalar quantization (SQ8) for embedding search — the standard
  * middle point on the compression/recall curve between full floats
  * (q_ann_brute) and product quantization (similarity/Pq.scala):
  * 4× smaller vectors, recall typically ≥ 0.95 where PQ trades much
  * deeper compression for more loss.
  *
  * Per-vector symmetric scheme: q_i = round(127 · v_i / max|v|),
  * stored as `array<tinyint>` with one per-vector rescale factor
  * f = max|v| / (127 · ‖v‖), so
  *
  *   cos(a, b) ≈ dotI8(q_a, q_b) · f_a · f_b
  *
  * The dot kernel ([[graft.functions.ByteVecDot]]) accumulates in
  * 64-bit INTEGER arithmetic — exact, no float-order sensitivity —
  * so the scheme's entire error is the rounding at encode time.
  *
  * 100 TB shape: encoding is a pure per-row projection (no shuffle,
  * whole-stage codegen end to end); the search is the same
  * broadcast-queries × streamed-corpus scan as the float brute path
  * but moves ¼ of the bytes through the scan and the score loop —
  * memory-bandwidth-bound at corpus scale, so the byte width IS the
  * throughput. Measured single-node (round 9, 500 queries × 200k
  * vectors = 100M pairs, min-of-3): 1.92 s vs the float path's
  * 2.83 s — 1.47× even while compute-bound locally; the bandwidth
  * term grows with corpus size. Composes with IVF the same way PQ
  * does (quantize per cell after assignment) if deeper pruning is
  * needed — see [[topKIvf]].
  */
object Sq8 {

  /** Encode `vecCol` to (vec_id, qvec: array<tinyint>, f: double).
    * Zero vectors encode to all-zero qvec with f = 0 (their cosine
    * against anything is undefined; 0 keeps scores finite).
    */
  def encode(
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      carryCols: Seq[String] = Nil): DataFrame = {
    val v = col(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    val norm = Ann.l2Norm(v)
    vectors
      .withColumn("__max_abs", maxAbs)
      .withColumn("__norm", norm)
      .select((col(idCol).as("vec_id") +: carryCols.map(col)) ++ Seq(
        transform(v, x =>
          when(col("__max_abs") > 0,
            round(x.cast("double") * lit(127.0) / col("__max_abs")))
            .otherwise(lit(0.0)).cast("tinyint")).as("qvec"),
        when(col("__norm") > 0 && col("__max_abs") > 0,
          col("__max_abs") / (lit(127.0) * col("__norm")))
          .otherwise(lit(0.0)).as("f")): _*)
  }

  /** Approximate cosine between two encoded rows' (qvec, f) pairs. */
  def cosineQ(qa: Column, fa: Column, qb: Column, fb: Column): Column =
    VectorFunctions.byteVecDot(qa, qb).cast("double") * fa * fb

  /** IVF-SQ8: coarse cells prune the search ([[Ivf]]'s centroid
    * probing, unchanged), int8 quantized vectors score inside the
    * probed cells — the probed-cell scan moves ¼ of the raw IVF's
    * bytes, which is the whole cost of that stage at corpus scale.
    * The third compression point beside PQ (deeper, lossier) and raw
    * floats (exact, heaviest); composition is the same seam IVF-PQ
    * uses.
    */
  def topKIvf(
      index: Ivf.Index,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      eligible: Option[DataFrame] = None): DataFrame = {
    val nP = math.min(nProbe, index.centroids.length)
    // filtered search: eligible ids semi-join BEFORE the int8 encode
    // and the cell shuffle — see Ivf.topK's eligible doc
    val base = eligible match {
      case Some(e) =>
        val ids = e.select(col(e.columns.head).as("id")).distinct()
        index.assigned.join(ids, Seq("id"), "left_semi")
      case None => index.assigned
    }
    val corpus = encode(
      base.select(col("id").as("vec_id"), col("vec").as("embedding"),
        col("cell")),
      "vec_id", "embedding", carryCols = Seq("cell"))
    val qEnc = encode(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("qvec").as("q_q"),
        col("f").as("q_f"))
    val probeCells = graft.functions.CentroidFunctions
      .centroidTopCells(col(vecCol), index.centroids, nP, "cosine")
    val probed = queries
      .select(col(idCol).as("query_id"), explode(probeCells).as("cell"))
      .join(qEnc, "query_id")
    val cand = probed.join(corpus.hint("shuffle_hash"), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineQ(col("q_q"), col("q_f"), col("qvec"), col("f")).as("cos"))
      .groupBy("query_id", "neighbor_id")
      .agg(max("cos").as("cos"))
    RelationalOps.topKPerGroupPartial(
      cand, Seq("query_id"),
      score = col("cos"), id = col("neighbor_id"),
      k = k, scoreAscending = false,
      idName = "neighbor_id", scoreName = "cos")
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Top-k neighbors of each encoded query against the encoded
    * corpus — [[Ann.bruteForceTopK]]'s exact shape (broadcast query
    * side, map-side k-heap reduction, cos desc / id asc total order)
    * over quarter-width vectors.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("qvec").as("q_q"), col("f").as("q_f")))
    val scored = corpus
      .select(col("vec_id").as("neighbor_id"), col("qvec").as("c_q"),
        col("f").as("c_f"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineQ(col("q_q"), col("q_f"), col("c_q"), col("c_f")).as("cos"))
    RelationalOps
      .topKPerGroupPartial(
        scored, Seq("query_id"),
        score = col("cos"), id = col("neighbor_id"),
        k = k, scoreAscending = false,
        idName = "neighbor_id", scoreName = "cos")
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}
