package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.RelationalOps

/** Hybrid retrieval — fuse per-query rankings from heterogeneous
  * retrievers (lexical [[graft.text.Bm25]], vector [[Ann]]/[[Ivf]],
  * anything emitting `(query_id, rank, doc_id)`) with Reciprocal Rank
  * Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  *
  *   rrf(d) = Σ_sources 1 / (c + rank_source(d))
  *
  * RRF deliberately consumes RANKS, not scores — BM25 and cosine live
  * on incomparable scales, and rank fusion needs no per-source
  * calibration, which is why it is the default fusion in production
  * retrieval stacks. A document absent from a source's top-k simply
  * contributes nothing from that source.
  *
  * Scale shape: each input is already a top-k frame (k·queries rows —
  * tiny by construction, whatever the corpus size behind it), so the
  * fusion is a union + one (query, doc)-keyed aggregate + the map-side
  * k-heap reduction — no corpus access at all. The per-source
  * retrievals it consumes keep their own scale guarantees (postings
  * never shuffle at query time; ANN stays cell-bounded).
  *
  * Determinism: contributions are exact binary doubles summed over at
  * most `sources` terms (IEEE addition is commutative, and ties in the
  * fused score are broken by doc id after a 6-decimal round), so the
  * fused ranking is engine-portable — the DuckDB oracle reproduces it
  * bit-for-bit.
  */
object Hybrid {

  /** Fuse ranked lists into a per-query top-k by RRF score.
    *
    * Inputs must share the `(qCol, rankCol, idCol)` schema (extra
    * columns are ignored). Output: (`qCol`, rank, `idCol`, rrf) with
    * rank 1-based by (rrf desc, id asc) on the 6-decimal-rounded
    * fused score.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      k: Int,
      c: Int = 60,
      qCol: String = "query_id",
      idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(c >= 0, "rrf constant must be non-negative")
    val contribs = rankings.map(
      _.select(col(qCol), col(idCol),
        (lit(1.0) / (lit(c.toDouble) + col(rankCol).cast("double"))).as("__contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(qCol), col(idCol))
      .agg(round(sum(col("__contrib")), 6).as("rrf"))
    RelationalOps.topKPerGroupPartial(
      fused,
      keys = Seq(qCol),
      score = col("rrf"),
      id = col(idCol),
      k = k,
      scoreAscending = false,
      idName = idCol,
      scoreName = "rrf",
      rankCol = "rank")
  }
}
