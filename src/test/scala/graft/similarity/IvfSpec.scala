package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  test("IVF top-k recall beats hyperplane LSH at similar candidate budget") {
    val emb = graft.Tables.embeddings(spark, sf("embeddings"))
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Ann.bruteForceTopK(queries, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    val index = Ivf.build(emb, nLists = 8)
    val ivf = Ivf.topK(index, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall > 0.5, s"IVF recall $recall")
  }

  test("IVF index is deterministic (fixed seed) and covers the corpus") {
    val emb = graft.Tables.embeddings(spark, sf("embeddings"))
    val i1 = Ivf.build(emb, nLists = 8)
    val i2 = Ivf.build(emb, nLists = 8)
    assert(i1.assigned.select("id", "cell").collect().toSet ==
      i2.assigned.select("id", "cell").collect().toSet)
    assert(i1.assigned.count() == emb.count())
  }
}
