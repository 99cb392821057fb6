package graft

import org.apache.spark.sql.functions._

/** The mechanical gate behind ARCHITECTURE.md's "17 no_oracle queries"
  * table: (1) the set of declared queries WITHOUT an oracle is exactly
  * the documented one — a new rows-only query cannot slip in without
  * updating the mapping (and this spec), and every mapped twin must
  * itself be oracle-checked; (2) the one no_oracle query whose
  * accuracy no other suite gates (q_approx_sketch — Spark-internal
  * HLL++/KLL) is gated here against exact answers.
  */
class NoOracleTwinsSpec extends SparkSpec {

  /** no_oracle query → its ORACLE-CHECKED twins (empty = gated purely
    * by a recall/accuracy spec named in ARCHITECTURE.md).
    */
  private val twins: Map[String, Seq[String]] = Map(
    "q_ann_lsh" -> Seq("q_ann_brute"),
    "q_ann_lsh_recall" -> Nil, // AnnSpec recall gates
    "q_ann_ivf" -> Seq("q_ann_ivf_full"),
    "q_ann_ivf_recall" -> Nil, // IvfSpec recall gates
    "q_ann_pq" -> Seq("q_ann_brute"),
    "q_ann_pq_recall" -> Nil, // PqSpec recall gates
    "q_ann_ivfpq" -> Seq("q_ann_ivf_full", "q_ann_brute"),
    "q_ann_ivfpq_recall" -> Nil, // IvfPqSpec recall gates
    "q_ann_sq8_recall" -> Seq("q_ann_sq8_ingest"),
    "q_ann_ivfsq8_recall" -> Nil, // Sq8Spec relative-recall gate
    "q_ann_drift" -> Seq("q_ann_rebalance"),
    "q_dedup_minhash" -> Seq("q_dedup_minhash_md5"),
    "q_dedup_minhash_recall" -> Nil, // DedupSpec recall ≥ 0.9
    "q_dedup_simhash" -> Seq("q_dedup_simhash_md5"),
    "q_dedup_simhash_pairs" -> Seq("q_dedup_simhash_pairs_md5"),
    "q_sketch_kmv" -> Seq("q_count_distinct"),
    "q_approx_sketch" -> Seq("q_count_distinct", "q_agg_quantile"))

  test("the no_oracle set is exactly the documented mapping; twins are oracle-checked") {
    val declared = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val unknownOracles = oracled -- declared
    assert(unknownOracles.isEmpty,
      s"oracleSql names undeclared queries: $unknownOracles")
    val noOracle = declared -- oracled
    assert(noOracle == twins.keySet,
      s"no_oracle drift — undocumented: ${noOracle -- twins.keySet}; " +
        s"stale mapping entries: ${twins.keySet -- noOracle}")
    twins.values.flatten.foreach(t => assert(oracled(t),
      s"twin $t is not itself oracle-checked"))
  }

  test("q_approx_sketch accuracy: HLL++ within 10% of exact, KLL quantiles bracket") {
    val dir = sf("lineitem")
    val li = graft.Tables.lineitem(spark, dir)
    val row = li.agg(
      approx_count_distinct(col("l_partkey")).as("apx_p"),
      countDistinct(col("l_partkey")).as("ex_p"),
      approx_count_distinct(col("l_orderkey")).as("apx_o"),
      countDistinct(col("l_orderkey")).as("ex_o"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("apx_q50"),
      expr("percentile(l_quantity, 0.5)").as("ex_q50")).head()
    def within(apx: Long, ex: Long, tol: Double): Boolean =
      math.abs(apx - ex).toDouble <= tol * ex
    assert(within(row.getAs[Long]("apx_p"), row.getAs[Long]("ex_p"), 0.10),
      s"partkey HLL drifted: ${row.getAs[Long]("apx_p")} vs ${row.getAs[Long]("ex_p")}")
    assert(within(row.getAs[Long]("apx_o"), row.getAs[Long]("ex_o"), 0.10),
      s"orderkey HLL drifted: ${row.getAs[Long]("apx_o")} vs ${row.getAs[Long]("ex_o")}")
    // KLL at accuracy 1000 on small data: the approx median must land
    // within the exact median's close neighborhood (quantity is 1..50)
    val apxQ = row.getAs[Double]("apx_q50")
    val exQ = row.getAs[Double]("ex_q50")
    assert(math.abs(apxQ - exQ) <= 2.0,
      s"median estimate drifted: $apxQ vs exact $exQ")
  }
}
