package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.RelationalOps

/** TF-IDF keyword extraction — per-document top-k characteristic
  * terms, the curation companion to [[Bm25]] retrieval (same postings
  * frame, document-side instead of query-side): tag every document
  * with the terms that distinguish it from the corpus, for topic
  * routing, cluster labeling, and mixture diagnostics over a training
  * corpus.
  *
  * Score: (tf / dl) · ln((1 + N) / (1 + df)) — length-normalized term
  * frequency times add-one-smoothed inverse document frequency
  * (non-negative for every df ≤ N, defined for corpus-universal
  * terms). Scores round to 6 decimals BEFORE ranking with a term-asc
  * tiebreak, so the top-k is deterministic and engine-portable (the
  * BM25 rounding convention).
  *
  * Scale shape: one corpus scan into the (doc, term, tf, dl) postings
  * ([[Bm25.index]] — one shuffle), one term-keyed df aggregate
  * (map-side combined), and a map-side k-heap per doc
  * ([[RelationalOps.topKPerGroupPartial]]) — no window, no global
  * sort; the corpus-size scalar rides a broadcast cross join.
  */
object Tfidf {

  /** (doc_id, rank, term, score): the `k` highest-tf-idf terms per
    * document, rank 1-based by (score desc, term asc).
    */
  def topTerms(
      docs: DataFrame,
      k: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val post = Bm25.index(docs, idCol, textCol)
    val dfTerm = post.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = post
      .join(dfTerm, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", round(
        (col("tf").cast("double") / col("dl")) *
          log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))), 6))
    RelationalOps.topKPerGroupPartial(
      scored,
      keys = Seq("doc_id"),
      score = col("score"),
      id = col("term"),
      k = k,
      scoreAscending = false,
      idName = "term",
      scoreName = "score",
      rankCol = "rank")
  }
}
