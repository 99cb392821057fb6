package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps._

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("nullSafeEquiJoin matches null keys (pandas NaN=NaN semantics)") {
    val left = Seq(("a", Some(1.0), 10), ("b", None, 20), ("c", Some(3.0), 30))
      .toDF("k1", "k2", "lv")
    val right = Seq(("a", Some(1.0), "x"), ("b", Option.empty[Double], "y"))
      .toDF("k1", "k2", "rv")
    val out = nullSafeEquiJoin(left, right, Seq("k1", "k2"), "left")
      .orderBy("lv").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("rv") == "x")
    assert(out(1).getAs[String]("rv") == "y") // null key matched
    assert(out(2).getAs[String]("rv") == null)
  }

  test("antiJoinNew is idempotent (null-safe)") {
    val incoming = Seq(("a", Some(1.0)), ("b", None), ("c", Some(2.0))).toDF("k1", "k2")
    val existing = Seq(("a", Some(1.0)), ("b", Option.empty[Double])).toDF("k1", "k2")
    val novel = antiJoinNew(incoming, existing, Seq("k1", "k2")).collect()
    assert(novel.length == 1 && novel(0).getString(0) == "c")
    // second application on full set → empty
    assert(antiJoinNew(incoming, incoming, Seq("k1", "k2")).isEmpty)
  }

  test("dedupKeepFirst keeps the first row per key under ordering") {
    val df = Seq(("g1", 2, "second"), ("g1", 1, "first"), ("g2", 5, "only"))
      .toDF("k", "ord", "v")
    val out = dedupKeepFirst(df, Seq("k"), Seq(col("ord"))).orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("first", "only"))
  }

  test("withSurrogateKey continues from existingMax, deterministic order") {
    val df = Seq("b", "a", "c").toDF("name")
    val keyed = withSurrogateKey(df, "id", Seq(col("name")), existingMax = 10)
      .orderBy("id").collect()
    assert(keyed.map(r => (r.getInt(1), r.getString(0))).toSeq ==
      Seq((11, "a"), (12, "b"), (13, "c")))
  }

  test("topKPerGroup ranks with tie-break") {
    val df = Seq(("g", 1.0, 1), ("g", 2.0, 2), ("g", 2.0, 3), ("h", 9.0, 4))
      .toDF("k", "score", "id")
    val out = topKPerGroup(df, Seq("k"), Seq(col("score").desc, col("id").asc), 2)
      .orderBy("k", "rn").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(2, 3, 4))
  }

  test("unionDistinct merges role-playing columns") {
    val a = Seq("x", "y").toDF("v")
    val b = Seq("y", "z").toDF("v")
    assert(unionDistinct(a, b).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("x", "y", "z"))
  }
}
