package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.4): incremental idempotence,
  * role-merge commutativity, derived-measure sign preservation —
  * checked over ScalaCheck-generated inputs (nulls included) with
  * fixed seeds for reproducibility.
  */
class PropertySpec extends SparkSpec {
  import RelationalOps._
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Option[Double])]] =
    Gen.listOfN(
      12,
      Gen.zip(
        Gen.oneOf("a", "b", "c", "d"),
        Gen.option(Gen.choose(0.0, 3.0).map(v => math.rint(v)))))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: antiJoinNew(x, x) is empty — loading twice adds nothing") {
    samples(rowsGen, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k1", "k2")
      assert(antiJoinNew(df, df, Seq("k1", "k2")).isEmpty, s"rows=$rows")
    }
  }

  test("property: novel rows + matched rows partition the incoming set") {
    val pairs = samples(Gen.zip(rowsGen, rowsGen), 8)
    pairs.foreach { case (incoming, existing) =>
      val inc = incoming.toDF("k1", "k2").distinct()
      val ex = existing.toDF("k1", "k2").distinct()
      val novel = antiJoinNew(inc, ex, Seq("k1", "k2"))
      // novel rows are still novel vs existing (stability)
      assert(antiJoinNew(novel, ex, Seq("k1", "k2")).count() == novel.count())
      // novel ∪ (incoming ∖ novel) = incoming (no row lost or invented)
      assert(novel.unionByName(inc.exceptAll(novel)).count() == inc.count())
    }
  }

  test("property: unionDistinct is commutative") {
    samples(Gen.zip(rowsGen, rowsGen), 8).foreach { case (a, b) =>
      val da = a.toDF("k1", "k2")
      val db = b.toDF("k1", "k2")
      val ab = unionDistinct(da, db).collect().map(_.toString).sorted.toSeq
      val ba = unionDistinct(db, da).collect().map(_.toString).sorted.toSeq
      assert(ab == ba)
    }
  }

  test("property: dedupKeepFirst yields exactly one row per key") {
    samples(rowsGen, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i) }
        .toDF("k", "v", "ord")
      val out = dedupKeepFirst(df, Seq("k"), Seq(col("ord")))
      assert(out.count() == df.select("k").distinct().count())
    }
  }

  test("property: total_emission non-negative when inputs are") {
    val gen = Gen.listOfN(10, Gen.zip(Gen.choose(0.0, 1000.0), Gen.choose(0, 400)))
    samples(gen, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("distance_km", "co2")
        .withColumn("total_emission", col("distance_km") * col("co2"))
      assert(df.filter(col("total_emission") < 0).isEmpty)
    }
  }
}
