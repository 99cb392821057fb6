package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000)

  test("asofJoinBackward: most recent right row at-or-before each left ts") {
    val trades = Seq(
      (1L, "A", ts(5)), (2L, "A", ts(10)), (3L, "A", ts(0)), (4L, "B", ts(7)))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(1), 100.0), ("A", ts(5), 101.0), ("A", ts(9), 102.0),
      ("B", ts(8), 50.0))
      .toDF("sym", "ts", "px")
    val out = RelationalOps.asofJoinBackward(
      trades, quotes, Seq("sym"), "ts", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    assert(out(1L) == Some(101.0)) // equal ts matches (inclusive)
    assert(out(2L) == Some(102.0)) // latest before 10
    assert(out(3L) == None)        // nothing at-or-before 0
    assert(out(4L) == None)        // B's only quote is after the trade
  }

  test("asofJoinForward: earliest right row at-or-after each left ts") {
    val trades = Seq(
      (1L, "A", ts(5)), (2L, "A", ts(10)), (3L, "A", ts(0)), (4L, "B", ts(9)))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(1), 100.0), ("A", ts(5), 101.0), ("A", ts(9), 102.0),
      ("B", ts(8), 50.0))
      .toDF("sym", "ts", "px")
    val out = RelationalOps.asofJoinForward(
      trades, quotes, Seq("sym"), "ts", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    assert(out(1L) == Some(101.0)) // equal ts matches (inclusive)
    assert(out(2L) == None)        // nothing at-or-after 10
    assert(out(3L) == Some(100.0)) // earliest overall
    assert(out(4L) == None)        // B's only quote is before the trade
  }

  test("asofJoinBackward plan: one shuffle on the key, no join node") {
    val trades = Seq((1L, "A", ts(5))).toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", ts(1), 100.0)).toDF("sym", "ts", "px")
    val plan = RelationalOps.asofJoinBackward(
      trades, quotes, Seq("sym"), "ts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan) // union+window, not a range join
  }
}
