package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators (`org.apache.spark.sql.expressions.Aggregator`) —
  * the Dataset-typed aggregation surface. These compile to proper
  * partial/final aggregation (map-side combine) like any built-in agg.
  */
object TypedAggregators {

  /** Weighted mean: Σ(w·x) / Σ(w); empty → 0. Used e.g. for
    * quality-weighted corpus statistics where each document's metric
    * is weighted by its quality score. `f` extracts (value, weight)
    * from the input type, so the same aggregator composes with any
    * typed Dataset.
    */
  class WeightedMeanOf[IN](f: IN => (Double, Double))
      extends Aggregator[IN, (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: IN): (Double, Double) = {
      val a = f(in)
      (b._1 + a._1 * a._2, b._2 + a._2)
    }
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) 0.0 else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  object WeightedMean extends WeightedMeanOf[(Double, Double)](identity)
}
