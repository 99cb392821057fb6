package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the relational shape of the
  * CCNet / CC-100 "LM perplexity" quality gate (Wenzek et al. 2020):
  * train token probabilities on a reference corpus, score every
  * candidate doc by cross-entropy (average negative log-probability),
  * and gate on the score. High xent ⇒ token distribution far from
  * the reference ⇒ boilerplate/garbled/off-language text.
  *
  * A unigram model is exactly a (term, prob) TABLE, so train and
  * score are both plain DataFrame algebra:
  *
  *  - '''train''': one corpus shuffle (term-keyed count), then
  *    add-α smoothed probabilities against the total — α reserves
  *    mass `α/(total + α(V+1))` for out-of-vocabulary terms at score
  *    time (V = trained vocab size).
  *  - '''score''': explode candidate tokens, term-keyed join against
  *    the model, per-doc average. The model table follows Heaps' law
  *    (vocab grows ~√corpus) but is NOT assumed broadcastable — no
  *    hint, AQE picks broadcast when it fits (the r6 span-excision
  *    lesson). The candidate token stream shuffles once on the term
  *    key and once on the doc key; both aggregations are map-side
  *    combined.
  *
  * Scores round to 4 decimals on the aggregate (the oracle-portable
  * convention — per-term log-probs stay raw doubles).
  */
object UnigramLm {

  /** Smoothed unigram model: (term, prob) with
    * prob = (c + α) / (total + α·(V+1)); plus the OOV row is NOT
    * materialized — [[score]] coalesces misses to α/(total + α(V+1)).
    */
  def train(
      docs: DataFrame,
      textCol: String = "text",
      alpha: Double = 1.0): DataFrame = {
    val tf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("c"))
    val tot = tf.agg(sum("c").as("total"), count(lit(1)).as("v"))
    tf.crossJoin(broadcast(tot))
      .select(
        col("term"),
        ((col("c") + lit(alpha)) / (col("total") + lit(alpha) * (col("v") + 1)))
          .as("prob"),
        (lit(alpha) / (col("total") + lit(alpha) * (col("v") + 1))).as("oov_prob"))
  }

  /** Cross-entropy per doc under a trained model:
    * (`idCol`, n_tokens, xent) with xent = −avg(ln p(term)), rounded
    * to 4 decimals. Terms unseen at train time get the model's
    * smoothed OOV mass. Zero-token docs emit no row.
    */
  def score(
      docs: DataFrame,
      model: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val oov = model.select(max("oov_prob").as("oov"))
    val toks = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
    toks
      .join(model.select("term", "prob"), Seq("term"), "left")
      .crossJoin(broadcast(oov))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-avg(log(coalesce(col("prob"), col("oov")))), 4).as("xent"))
  }

  /** Train on the corpus and score it against itself (the common
    * "how self-similar is each doc" curation probe — no OOV by
    * construction).
    */
  def scoreSelf(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 1.0): DataFrame =
    score(docs, train(docs, textCol, alpha), idCol, textCol)
}
