package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.RelationalOps

/** BM25 lexical retrieval — the inverted-index complement to the
  * vector-ANN family in [[graft.similarity]]: top-k documents per
  * query string under the Okapi BM25 ranking function (Robertson &
  * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
  * Beyond"), with the Lucene-style non-negative idf
  * `ln(1 + (N - df + 0.5) / (df + 0.5))`.
  *
  * Everything is relational — postings are rows, not an in-memory
  * index — so the same code ranks 500 docs locally and 100 TB on a
  * cluster:
  *
  *  - '''Index build''' ([[index]]): one corpus shuffle to count
  *    (doc, term) frequencies, one doc-keyed join to attach doc
  *    length. At scale this frame is materialized ONCE (written
  *    partitioned/bucketed by `term`, e.g. via
  *    [[graft.sources.TableStore]]) and amortized across every query
  *    batch; term-partition pruning then turns retrieval into a
  *    lookup of only the query's terms.
  *  - '''Retrieval''' ([[topKFromIndex]]): the query side is tiny by
  *    definition (a handful of terms per query), so it is broadcast
  *    against the postings — the postings NEVER shuffle at query
  *    time. A `left_semi` broadcast prune cuts the scan to
  *    query-term rows before any scoring work; document frequencies
  *    are computed from that pruned slice (df is per-term, so
  *    pruning by term loses nothing). The final per-query ranking is
  *    the map-side k-heap partial aggregate
  *    ([[RelationalOps.topKPerGroupPartial]]) — the wire carries
  *    k·partitions candidates per query, never the full scored set.
  *
  * Scores are rounded to 4 decimals BEFORE ranking: the synthetic
  * and real corpora both contain docs with mathematically equal
  * scores, and summation order differs between engines/partitions —
  * ranking the rounded score with a `doc_id` tiebreak makes the
  * top-k deterministic and engine-portable (the same convention the
  * DuckDB oracle uses).
  */
object Bm25 {

  /** One row per (doc_id, term) with term frequency `tf` and doc
    * length `dl` (total token count — whitespace tokens, lowercased,
    * the corpus-wide [[TextFunctions.tokens]] segmentation). This is
    * the frame to persist term-partitioned at scale.
    */
  def index(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    // dl is functionally dependent on doc_id, so carrying it through
    // the explode and into the grouping key costs nothing and saves
    // the doc-keyed self-join (and the second corpus scan) a separate
    // dl frame would need: one scan, one shuffle, no join. The token
    // array is materialized in its own projection FIRST — writing
    // size(tokens(text)) as a sibling of explode(tokens(text)) puts
    // the size() above the Generate, re-running the regex tokenizer
    // once per exploded TOKEN instead of once per doc (measured 11×
    // on the ×20 probe: 26 s vs 2.3 s for the aggregate)
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .select("doc_id", "term", "tf", "dl")

  /** Corpus stats BM25 needs: `n` (total docs) and `avgdl`
    * (total tokens / total docs — defined over ALL docs so zero-token
    * docs don't skew the denominator differently across engines).
    * One scan, one row.
    */
  def stats(
      docs: DataFrame,
      textCol: String = "text"): DataFrame =
    docs.agg(
      count(lit(1)).as("n"),
      (sum(size(TextFunctions.tokens(col(textCol)))) / count(lit(1))).as("avgdl"))

  /** Top-k docs per query over a prebuilt [[index]] frame.
    *
    * `queries` is (`qidCol`, `qtextCol`); query text tokenizes with
    * the same segmentation as the corpus and DISTINCT query terms
    * score once each (the qtf=1 convention). Output:
    * (query_id, rank, doc_id, score) with rank 1-based by
    * (score desc, doc_id asc) on the 4-decimal-rounded score.
    */
  def topKFromIndex(
      idx: DataFrame,
      corpusStats: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      qidCol: String = "query_id",
      qtextCol: String = "query_text"): DataFrame = {
    val qterms = queries
      .select(col(qidCol).as("query_id"), explode(TextFunctions.tokens(col(qtextCol))).as("term"))
      .distinct()
    // prune the postings scan to query-term rows BEFORE df/scoring;
    // df per term is unchanged by a term-keyed prune. The pruned
    // slice feeds TWO consumers (the df aggregate and the scoring
    // join), and ReusedExchange cannot unify them — column pruning
    // gives each branch a different subtree — so without an explicit
    // materialization the whole upstream index pipeline runs once
    // per consumer (measured 2-3× on the ×20 probe). localCheckpoint
    // (eager, MEMORY_AND_DISK, the componentDedup precedent) pins
    // the slice; it is query-term-bounded — a corpus FRACTION, never
    // the corpus — and spills rather than OOMs on stopword queries.
    val pruned = idx
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .select("term", "doc_id", "tf", "dl")
      .localCheckpoint()
    val dfTerm = pruned.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = pruned
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfTerm), Seq("term"))
      .crossJoin(broadcast(corpusStats))
      .withColumn("part",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("part"), 4).as("score"))
    RelationalOps.topKPerGroupPartial(
      scored,
      keys = Seq("query_id"),
      score = col("score"),
      id = col("doc_id"),
      k = k,
      scoreAscending = false,
      idName = "doc_id",
      scoreName = "score",
      rankCol = "rank")
  }

  /** Convenience: build the index inline and retrieve. */
  def topK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text",
      qidCol: String = "query_id",
      qtextCol: String = "query_text"): DataFrame =
    topKFromIndex(
      index(docs, idCol, textCol), stats(docs, textCol),
      queries, k, k1, b, qidCol, qtextCol)
}
