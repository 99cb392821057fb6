package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextFunctions

/** End-to-end training-data cleaning: the composition the extension
  * operators exist for. Stage order is the standard
  * cheapest-filter-first arrangement — per-row scoring before any
  * shuffle, exact dedup (one shuffle on the fingerprint) before
  * near-dedup (banded LSH), so each stage sees the smallest possible
  * input.
  *
  *   quality gate → language gate → exact dedup → MinHash near-dedup
  *
  * Every stage is a DataFrame → DataFrame function; at 100 TB the
  * composition is one lazy plan and Catalyst pipelines the per-row
  * stages into the scan.
  */
object TrainingDataPipeline {

  case class Config(
      minQuality: Double = 0.3,
      keepLangs: Set[String] = Set("en"),
      minhashThreshold: Double = 0.8,
      idCol: String = "doc_id",
      textCol: String = "text")

  def qualityGate(docs: DataFrame, conf: Config): DataFrame =
    docs.filter(TextFunctions.qualityScore(col(conf.textCol)) >= conf.minQuality)

  def languageGate(docs: DataFrame, conf: Config): DataFrame =
    docs.filter(TextFunctions.langId(col(conf.textCol))
      .isin(conf.keepLangs.toSeq: _*))

  def clean(docs: DataFrame, conf: Config = Config()): DataFrame = {
    val gated = languageGate(qualityGate(docs, conf), conf)
    val exact = Dedup.exactDedup(gated, conf.idCol, conf.textCol)
    Dedup.minhashDedup(exact, conf.idCol, conf.textCol, conf.minhashThreshold)
  }

  /** Per-stage survival counts — the pipeline's observability story.
    *
    * The two per-row gates are counted in ONE scan with conditional
    * aggregation (a naive count-per-stage would rescan the input once
    * per stage), and the gated/deduped frames are persisted so the
    * shuffle stages (exact dedup, minhash LSH) each read their input
    * exactly once.
    */
  def funnel(docs: DataFrame, conf: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qPass = TextFunctions.qualityScore(col(conf.textCol)) >= conf.minQuality
    val lPass = TextFunctions.langId(col(conf.textCol)).isin(conf.keepLangs.toSeq: _*)
    val Array(n0, n1, n2) = docs
      .agg(count(lit(1)), count_if(qPass), count_if(qPass && lPass))
      .first().toSeq.map(_.asInstanceOf[Long]).toArray
    val gated = docs.filter(qPass && lPass).persist()
    val e = Dedup.exactDedup(gated, conf.idCol, conf.textCol).persist()
    val n3 = e.count()
    // survivors = input minus docs with a lower-id near-dup; counting the
    // (small) drop set avoids materializing the anti-join over all docs
    val n4 = n3 - Dedup
      .minhashCandidates(e, conf.idCol, conf.textCol, threshold = conf.minhashThreshold)
      .select("id_b").distinct().count()
    val out = Seq(
      ("0_input", n0), ("1_quality", n1), ("2_language", n2),
      ("3_exact_dedup", n3), ("4_near_dedup", n4))
      .toDF("stage", "docs")
    gated.unpersist()
    e.unpersist()
    out
  }
}
