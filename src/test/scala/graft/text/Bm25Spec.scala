package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "fast scan fast"),
    (1L, "slow scan of the table"),
    (2L, "fast table"),
    (3L, "merge batch window")).toDF("doc_id", "text")

  test("bm25 score matches the hand-computed Okapi formula") {
    val queries = Seq((0, "fast")).toDF("query_id", "query_text")
    val out = Bm25.topK(docs, queries, k = 10).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getDouble(r.fieldIndex("score"))))
      .toMap
    // corpus: N=4, total tokens 3+5+2+3=13, avgdl=3.25; "fast" df=2
    val n = 4.0; val df = 2.0; val avgdl = 13.0 / 4.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet === Set(0L, 2L))
    assert(out(0L) === s(2.0, 3.0))
    assert(out(2L) === s(1.0, 2.0))
  }

  test("ranking is deterministic on ties: rounded score desc, doc_id asc") {
    val tied = Seq(
      (5L, "alpha beta"), (1L, "alpha beta"), (3L, "alpha beta"),
      (2L, "gamma")).toDF("doc_id", "text")
    val out = Bm25.topK(tied, Seq((0, "alpha")).toDF("query_id", "query_text"), k = 10)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 3L, 5L)) // equal scores → id order
  }

  test("query terms absent from the corpus contribute nothing; no-hit queries emit no rows") {
    val queries = Seq((0, "fast zebra"), (1, "zebra")).toDF("query_id", "query_text")
    val out = Bm25.topK(docs, queries, k = 10)
    val q0 = Bm25.topK(docs, Seq((0, "fast")).toDF("query_id", "query_text"), k = 10)
    assert(out.filter(col("query_id") === 1).count() === 0)
    assert(out.filter(col("query_id") === 0).select("doc_id", "score").collect().toSet ===
      q0.select("doc_id", "score").collect().toSet)
  }

  test("query-time joins broadcast the query side (postings never shuffle at query time)") {
    val queries = Seq((0, "fast table scan")).toDF("query_id", "query_text")
    val idx = Bm25.index(docs).cache()
    try {
      idx.count()
      val plan = Bm25.topKFromIndex(idx, Bm25.stats(docs), queries)
        .queryExecution.executedPlan.toString
      // the semi-prune, the qterms join, and the df join are all
      // broadcasts; no sort-merge join may appear after the index scan
      assert(plan.contains("BroadcastHashJoin"))
      assert(!plan.contains("SortMergeJoin"))
    } finally idx.unpersist()
  }

  test("repeated duplicate query terms score once (distinct-term convention)") {
    val a = Bm25.topK(docs, Seq((0, "fast fast fast")).toDF("query_id", "query_text"), k = 10)
    val b = Bm25.topK(docs, Seq((0, "fast")).toDF("query_id", "query_text"), k = 10)
    assert(a.select("doc_id", "score").collect().toSet === b.select("doc_id", "score").collect().toSet)
  }
}
