package graft.functions

import graft.SparkSpec

class TypedAggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean aggregates with partial/final combine") {
    val ds = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 0.0)).toDS()
    val out = ds.select(TypedAggregators.WeightedMean.toColumn).head()
    assert(math.abs(out - 17.5) < 1e-12) // (10*1 + 20*3 + 30*0) / 4
    // empty input → 0, not NaN
    assert(Seq.empty[(Double, Double)].toDS()
      .select(TypedAggregators.WeightedMean.toColumn).head() == 0.0)
  }

  test("WeightedMean works grouped via groupByKey") {
    val ds = Seq(("a", 10.0, 1.0), ("a", 30.0, 1.0), ("b", 5.0, 2.0)).toDS()
    val out = ds.groupByKey(_._1)
      .agg(new TypedAggregators.WeightedMeanOf[(String, Double, Double)](
        t => (t._2, t._3)).toColumn)
      .collect().toMap
    assert(out("a") == 20.0 && out("b") == 5.0)
  }
}
