package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HybridSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (Long, Int, Long)*) =
    rows.toDF("query_id", "rank", "doc_id")

  test("a doc ranked by both sources outranks an equally-ranked single-source doc") {
    val a = ranking((0L, 1, 10L), (0L, 2, 11L))
    val b = ranking((0L, 1, 10L), (0L, 2, 12L))
    val fused = Hybrid.rrfFuse(Seq(a, b), k = 3).orderBy("rank")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("rrf")))
    assert(fused.head._2 == 10L) // 2/61
    assert(fused.head._3 == math.rint(2.0 / 61.0 * 1e6) / 1e6)
    // 11 and 12 tie at 1/62 → doc-id tiebreak
    assert(fused.map(_._2).toSeq == Seq(10L, 11L, 12L))
  }

  test("absent docs contribute nothing; queries fuse independently") {
    val a = ranking((0L, 1, 10L), (1L, 1, 20L))
    val b = ranking((1L, 1, 20L))
    val fused = Hybrid.rrfFuse(Seq(a, b), k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) -> r.getAs[Double]("rrf")).toMap
    assert(fused((0L, 10L)) == math.rint(1.0 / 61.0 * 1e6) / 1e6)
    assert(fused((1L, 20L)) == math.rint(2.0 / 61.0 * 1e6) / 1e6)
  }

  test("the c constant damps rank differences") {
    val a = ranking((0L, 1, 10L), (0L, 2, 11L))
    val smallC = Hybrid.rrfFuse(Seq(a), k = 2, c = 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    assert(smallC(10L) == 1.0 && smallC(11L) == 0.5)
  }
}
