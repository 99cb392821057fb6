package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val raw = Seq(
    (1L, "alpha alpha beta"),
    (2L, "beta gamma gamma"),
    (3L, "alpha alpha alpha"),
    (4L, "delta delta beta"),
    (5L, "alpha beta gamma")).toDF("doc_id", "text")
  private val target = Seq(
    (100L, "alpha alpha alpha beta")).toDF("doc_id", "text")

  test("weights rank domain-like docs above off-domain ones") {
    val w = Dsir.importanceWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 5)
    // doc 3 (pure alpha) must out-weigh doc 4 (pure delta — OOV in
    // the target model); doc 1 sits above doc 2
    assert(w(3L) > w(4L))
    assert(w(1L) > w(2L))
  }

  test("exact arithmetic on a hand-computable pair") {
    // target model: alpha c=3, beta c=1, total=4, V=2, α=1 →
    //   p(alpha)=4/7, p(beta)=2/7, oov=1/7
    // raw model: alpha 6, beta 4, gamma 3, delta 2, total=15, V=4 →
    //   p(alpha)=7/20, p(beta)=5/20, p(gamma)=4/20, p(delta)=3/20
    val w = Dsir.importanceWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val expected3 = r4(3 * (math.log(4.0 / 7) - math.log(7.0 / 20)))
    assert(math.abs(w(3L) - expected3) < 1e-9, s"${w(3L)} vs $expected3")
    val expected4 = r4(
      2 * (math.log(1.0 / 7) - math.log(3.0 / 20)) +
        (math.log(2.0 / 7) - math.log(5.0 / 20)))
    assert(math.abs(w(4L) - expected4) < 1e-9, s"${w(4L)} vs $expected4")
  }

  test("resample is deterministic, bounded by k, and weight-biased") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val tgt = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val a = Dsir.resample(docs, tgt, k = 50).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val b = Dsir.resample(docs, tgt, k = 50).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b && a.length == 50)
    // the resample's mean weight must beat the corpus mean (it samples
    // ∝ exp(logw)) — a weak but real bias assertion
    val all = Dsir.importanceWeights(docs, tgt)
    val meanAll = all.agg(avg("logw")).head().getDouble(0)
    val meanSel = all.join(a.toDF("doc_id"), Seq("doc_id"))
      .agg(avg("logw")).head().getDouble(0)
    assert(meanSel > meanAll)
  }

  test("selectTopK returns the k heaviest, ties by doc_id") {
    val top = Dsir.selectTopK(raw, target, k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top.head == 3L) // pure-alpha doc dominates
    assert(top.length == 2)
  }
}
