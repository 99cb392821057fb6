package graft.text

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
  // counts a:2 b:2 c:1, total 5, V=3, add-1 denom 9

  test("train yields add-1 smoothed probabilities and OOV mass") {
    val m = UnigramLm.train(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m("a")._1 === 3.0 / 9 && m("b")._1 === 3.0 / 9 && m("c")._1 === 2.0 / 9)
    assert(m("a")._2 === 1.0 / 9)
  }

  test("scoreSelf cross-entropy matches the hand computation") {
    val x = UnigramLm.scoreSelf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(x(1L)._1 === 3L)
    assert(x(1L)._2 === BigDecimal(math.log(3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(x(2L)._2 === BigDecimal((math.log(9.0 / 3) + math.log(9.0 / 2)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("unseen terms at score time get the smoothed OOV mass") {
    val model = UnigramLm.train(docs)
    val x = UnigramLm.score(Seq((3L, "z a")).toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(x(3L) === BigDecimal((math.log(9.0) + math.log(3.0)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("garbled text scores worse than modal text on the real corpus") {
    val corpus = graft.Tables.documents(spark, sf("documents"))
    val model = UnigramLm.train(corpus)
    val probes = Seq(
      (100000L, "table scan query join window batch"),
      (100001L, "zxqv jkwp mmvR qqtt zzyy blorp")).toDF("doc_id", "text")
    val x = UnigramLm.score(probes, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(x(100001L) > x(100000L) + 1.0)
  }
}
