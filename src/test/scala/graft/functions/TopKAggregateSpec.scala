package graft.functions

import graft.SparkSpec
import graft.ops.RelationalOps
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(
      df: org.apache.spark.sql.DataFrame,
      asc: Boolean): org.apache.spark.sql.DataFrame = {
    val ord = if (asc) col("score").asc else col("score").desc
    RelationalOps.topKPerGroup(df, Seq("g"), Seq(ord, col("id").asc), 3)
      .select(col("g"), col("rn"), col("id"), col("score"))
  }

  private def partialTopK(
      df: org.apache.spark.sql.DataFrame,
      asc: Boolean): org.apache.spark.sql.DataFrame =
    RelationalOps.topKPerGroupPartial(
      df, Seq("g"), col("score"), col("id"), 3, asc, "id", "score")
      .select(col("g"), col("rn"), col("id"), col("score"))

  test("partial top-k matches the row_number window exactly (both directions)") {
    val rows = for { g <- 0 until 7; i <- 0 until 50 } yield
      (g, i.toLong, ((i * 2654435761L + g * 40503) % 1000).toDouble / 7.0)
    // repartition(8): entries must survive serialize/merge across partitions
    val df = rows.toDF("g", "id", "score").repartition(8)
    for (asc <- Seq(true, false)) {
      val w = windowTopK(df, asc).collect().toSet
      val p = partialTopK(df, asc).collect().toSet
      assert(p == w, s"asc=$asc: partial != window")
      assert(p.size == 21) // 7 groups x 3
    }
  }

  test("score ties break by id ascending, like the window") {
    val df = Seq(
      (1, 9L, 5.0), (1, 2L, 5.0), (1, 7L, 5.0), (1, 4L, 1.0)
    ).toDF("g", "id", "score").repartition(3)
    val p = partialTopK(df, asc = false).orderBy("rn")
      .select("id").as[Long].collect().toSeq
    assert(p == Seq(2L, 7L, 9L))
    val w = windowTopK(df, asc = false).orderBy("rn")
      .select("id").as[Long].collect().toSeq
    assert(p == w)
  }

  test("groups smaller than k return all their rows, rank-ordered") {
    val df = Seq((1, 5L, 2.0), (1, 3L, 8.0), (2, 1L, 4.0)).toDF("g", "id", "score")
    val out = partialTopK(df, asc = true).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(out == Seq((1, 1, 5L), (1, 2, 3L), (2, 1, 1L)))
  }

  test("string ids: serialization round-trip and binary-order tie-break") {
    val rows = for { g <- 0 until 3; i <- 0 until 40 } yield
      (g, f"doc_$i%03d", ((i * 31 + g) % 10).toDouble)
    val df = rows.toDF("g", "id", "score").repartition(5)
    val p = RelationalOps.topKPerGroupPartial(
      df, Seq("g"), col("score"), col("id"), 4, scoreAscending = true, "id", "score")
      .select(col("g"), col("rn"), col("id"), col("score"))
      .collect().toSet
    val w = RelationalOps.topKPerGroup(
      df, Seq("g"), Seq(col("score").asc, col("id").asc), 4)
      .select(col("g"), col("rn"), col("id"), col("score"))
      .collect().toSet
    assert(p == w)
    assert(p.size == 12)
  }

  test("null score or id rows are skipped, not ranked") {
    val df = Seq(
      (1, java.lang.Long.valueOf(1L), java.lang.Double.valueOf(3.0)),
      (1, null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(1.0)),
      (1, java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Double])
    ).toDF("g", "id", "score")
    val out = partialTopK(df, asc = true).collect()
    assert(out.length == 1 && out.head.getLong(2) == 1L)
  }

  test("plan reduces map-side: partial_top_k below the exchange, no Window") {
    val df = (0 until 100).map(i => (i % 4, i.toLong, i.toDouble))
      .toDF("g", "id", "score").repartition(6)
    val plan = partialTopK(df, asc = false).queryExecution.executedPlan.toString
    assert("partial_top_k".r.findAllIn(plan).length >= 2, plan) // partial + final
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
