package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, sf("embeddings"))

  test("IVF-PQ index is deterministic and covers the corpus") {
    val i1 = IvfPq.build(emb, nLists = 8, m = 8, k = 16)
    val i2 = IvfPq.build(emb.repartition(7, col("vec_id")), nLists = 8, m = 8, k = 16)
    assert(i1.centroids.map(_.toSeq).toSeq == i2.centroids.map(_.toSeq).toSeq)
    val e1 = i1.encoded.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    val e2 = i2.encoded.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(e1 == e2)
    assert(e1.size == emb.count())
  }

  test("IVF-PQ recall: probing beats its candidate budget, full probe + refine ~= brute force") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Ann.bruteForceTopK(queries, emb, k = 5).cache()
    val index = IvfPq.build(emb, nLists = 8, m = 16, k = 16)
    def recall(nProbe: Int): Double = Ann.recallAgainst(
      IvfPq.topK(index, emb, queries, kNeighbors = 5, nProbe = nProbe), exact)
      .head().getAs[Double]("recall_at_k")
    val r3 = recall(3)
    val rFull = recall(8)
    exact.unpersist()
    // nProbe=3 of 8 cells: candidates ~3/8 of corpus; gates sit under
    // measured floors on the uniform-sphere worst case
    assert(r3 >= 0.3, s"IVF-PQ recall@5 (nProbe=3) $r3 < 0.3")
    assert(rFull >= 0.6, s"IVF-PQ recall@5 (full probe + refine) $rFull < 0.6")
    assert(rFull >= r3, s"recall not monotone in probe budget: $rFull < $r3")
  }

  test("residual encoding: own encoded twin surfaces in probed-cell ADC search") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val shifted = base.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(shifted)
    val index = IvfPq.build(corpus, nLists = 8, m = 16, k = 16)
    val queries = base.filter(col("vec_id") < 20)
    val top = IvfPq.topK(index, corpus, queries, kNeighbors = 5, nProbe = 8)
      .collect().groupBy(_.getAs[Long]("query_id"))
    top.foreach { case (qid, rows) =>
      assert(rows.exists(_.getAs[Long]("neighbor_id") == qid + 100000L),
        s"query $qid: identical twin not found by IVF-PQ at full probe")
    }
  }
}
