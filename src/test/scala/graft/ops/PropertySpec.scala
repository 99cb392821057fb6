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

  test("property: componentDedupStar == componentDedup on random graphs") {
    // both component algorithms must keep exactly the min id of every
    // connected component, whatever the edge shape
    val edgeGen = Gen.listOfN(15, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    samples(edgeGen, 10).foreach { edges =>
      val nodes = (0L until 20L).map(i => (i, s"d$i")).toDF("doc_id", "text")
      val pairs = edges.toDF("id_a", "id_b")
      val star = graft.dedup.Dedup.componentDedupStar(nodes, pairs)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val label = graft.dedup.Dedup.componentDedup(nodes, pairs)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(star == label, s"edges=$edges star=$star label=$label")
      // local union-find reference
      val parent = scala.collection.mutable.Map((0L until 20L).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0L until 20L).filter(i => find(i) == i).sorted
      assert(star == expected, s"edges=$edges star=$star unionfind=$expected")
    }
  }

  test("property: packSequences packs within budget and never drops a packable doc") {
    val docGen = Gen.listOfN(25, Gen.choose(0, 12)).map(_.zipWithIndex.map {
      case (n, i) => (i.toLong, (1 to n).map(_ => "w").mkString(" "))
    })
    samples(docGen, 6).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = graft.pipelines.TrainingDataPipeline
        .packSequences(df, maxSeqTokens = 10, bucketExpr = Some(col("doc_id") % 3))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pack_id"), r.getAs[Long]("tokens")))
      // every pack within budget
      out.groupBy(_._2).foreach { case (p, members) =>
        assert(members.map(_._3).sum <= 10, s"pack $p over budget")
      }
      // every doc that fits the window appears exactly once
      val packable = docs.count(_._2.split(" ").count(_.nonEmpty) <= 10)
      assert(out.length == packable, s"${out.length} packed vs $packable packable")
      assert(out.map(_._1).distinct.length == out.length)
    }
  }

  test("property: stratifiedSample returns min(k, stratum size) rows per stratum") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.oneOf("x", "y", "z"), Gen.choose(0L, 1000000L)))
    samples(gen, 6).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((s, v), i) => (s, v, i.toLong) }.toDF("stratum", "v", "uid")
      val out = stratifiedSample(df, Seq("stratum"), 5, Seq("uid"))
        .collect().map(r => (r.getString(0), r.getLong(2)))
      val sizes = rows.zipWithIndex.groupBy(_._1._1).view.mapValues(_.size).toMap
      out.groupBy(_._1).foreach { case (s, picked) =>
        assert(picked.length == math.min(5, sizes(s)), s"stratum $s")
        assert(picked.map(_._2).distinct.length == picked.length)
      }
      assert(out.groupBy(_._1).keySet == sizes.keySet)
    }
  }
}
