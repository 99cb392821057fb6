package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, sf("embeddings"))

  test("PQ training and encoding are deterministic and layout-independent") {
    val cb1 = Pq.train(emb, m = 8, k = 16)
    val cb2 = Pq.train(emb.repartition(7, col("vec_id")), m = 8, k = 16)
    assert(cb1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val e1 = Pq.encode(cb1, emb).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val e2 = Pq.encode(cb2, emb.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(e1 == e2)
    assert(e1.values.head.length == 8) // m code bytes per vector
  }

  test("ADC distance of a vector to its own code is (near-)minimal") {
    // each query's own encoded point must rank far above random ones:
    // include the query itself in the corpus under a shifted id and
    // assert it lands in the ADC top-5
    val cb = Pq.train(emb, m = 16, k = 16)
    val base = emb.select(col("vec_id"), col("embedding"))
    val shifted = base.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(shifted)
    val queries = emb.filter(col("vec_id") < 20)
    val top = Pq.adcTopK(cb, corpus, queries, kNeighbors = 5)
      .collect().groupBy(_.getAs[Long]("query_id"))
    top.foreach { case (qid, rows) =>
      assert(rows.exists(_.getAs[Long]("neighbor_id") == qid + 100000L),
        s"query $qid: own encoded twin not in ADC top-5")
    }
  }

  test("PQ recall gates: ADC alone clears the floor, refine recovers brute-force quality") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Ann.bruteForceTopK(queries, emb, k = 5).cache()
    val cb = Pq.train(emb, m = 16, k = 16) // 64 bits/vector at dim 64
    val adc = Ann.recallAgainst(
      Pq.adcTopK(cb, emb, queries, kNeighbors = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id")),
      exact).head().getAs[Double]("recall_at_k")
    val refined = Ann.recallAgainst(
      Pq.topK(cb, emb, queries, kNeighbors = 5, refineFactor = 8),
      exact).head().getAs[Double]("recall_at_k")
    exact.unpersist()
    // uniform random vectors on the 64-sphere are PQ's worst case (no
    // cluster structure); gates sit under the measured floors so a
    // codebook/LUT/ADC regression trips CI while real data clears big
    assert(adc >= 0.25, s"ADC recall@5 $adc < 0.25")
    assert(refined >= 0.6, s"refined recall@5 $refined < 0.6")
    assert(refined >= adc, s"refine lost recall: $refined < $adc")
  }

  test("degenerate cases: k=1 codebook and single-vector corpus encode and query") {
    import spark.implicits._
    val tiny = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(-0.5f)))
      .toDF("vec_id", "embedding")
    val cb = Pq.train(tiny, m = 2, k = 1)
    assert(cb.k == 1)
    val out = Pq.adcTopK(cb, tiny, tiny, kNeighbors = 1)
    assert(out.count() == 2) // each vector's sole neighbor is the other
  }
}
