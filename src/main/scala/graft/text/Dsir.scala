package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — select raw-corpus
  * documents whose n-gram distribution looks like a TARGET domain, the
  * standard pretraining-data curation move (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * public method): fit cheap unigram models over the target sample and
  * the raw corpus, weight every raw doc by its log likelihood RATIO
  * `log w(x) = Σ_t c_t(x) · ln(p_target(t) / p_raw(t))`, then take
  * either the top-k by weight (hard selection) or a Gumbel-top-k
  * RESAMPLE (importance sampling without replacement — keeps diversity
  * the hard cut destroys).
  *
  * Spark shape at 100 TB: both models are term-level aggregates (one
  * shuffle each over token counts, vocabulary-sized results); the
  * per-doc weight is one join of the raw corpus' tokens against the
  * two broadcast-sized probability tables + a groupBy(doc) — no
  * all-pairs anything, no driver-side state beyond the model sizes.
  * The Gumbel noise is DETERMINISTIC (hash-seeded per doc id, md5 so
  * an external engine reproduces it bit-for-bit), which makes the
  * sample itself reproducible and oracle-checkable — the property a
  * re-run of a 100 TB selection job needs anyway.
  *
  * Reference anchor: the reference pipeline has no data-selection
  * stage (append-only ETL); this is part of the training-data surface
  * the Spark re-expression adds. Rounding convention: per-doc weights
  * round to 4 decimals only at the OUTPUT (and before any rank), per
  * the house float-tie discipline.
  */
object Dsir {

  /** Per-doc log importance weight against a target-domain sample:
    * (`idCol`, n_tokens, logw). Terms unseen in a model take its
    * smoothed OOV mass ([[UnigramLm.train]]'s α-smoothing), so the
    * ratio is defined for every token of every raw doc. Zero-token
    * docs emit no row (they carry no evidence either way).
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 1.0): DataFrame = {
    val pT = UnigramLm.train(target, textCol, alpha)
      .select(col("term"), col("prob").as("pt"), col("oov_prob").as("oovt"))
    val pR = UnigramLm.train(raw, textCol, alpha)
      .select(col("term"), col("prob").as("pr"), col("oov_prob").as("oovr"))
    val oovT = broadcast(pT.agg(max("oovt").as("oovt")))
    // raw-corpus terms are all in pR by construction; only the target
    // side can miss
    val toks = raw.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    toks
      .join(pT.select("term", "pt"), Seq("term"), "left")
      .join(pR.select("term", "pr"), Seq("term"))
      .crossJoin(oovT)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(log(coalesce(col("pt"), col("oovt"))) - log(col("pr"))), 4)
          .as("logw"))
  }

  /** Top-`k` raw docs by importance weight — hard selection. Ties
    * break by `idCol` ascending (weights are rounded before the rank,
    * so cross-engine float noise cannot flip neighbors).
    */
  def selectTopK(
      raw: DataFrame,
      target: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 1.0): DataFrame =
    importanceWeights(raw, target, idCol, textCol, alpha)
      .orderBy(col("logw").desc, col(idCol))
      .limit(k)

  /** Gumbel-top-k importance RESAMPLE: add hash-seeded Gumbel noise
    * `-ln(-ln(u))` to each log weight and take the top k — a without-
    * replacement sample ∝ exp(logw), the actual DSIR estimator (hard
    * top-k over-selects near-duplicate high-weight docs; the resample
    * keeps tail diversity). `u` derives from md5(idCol) (first 8 hex
    * digits / 2³²; the portable-hash convention the dedup md5 twins
    * use), so the sample is deterministic and reproducible anywhere.
    */
  def resample(
      raw: DataFrame,
      target: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 1.0): DataFrame = {
    val w = importanceWeights(raw, target, idCol, textCol, alpha)
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0) // (0,1), never 0
    w.withColumn("score", round(col("logw") - log(-log(u)), 4))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
