package graft.pipelines

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class TrainingDataPipelineSpec extends SparkSpec {

  private def scored = graft.Tables.documents(spark, sf("documents"))
    .select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("tokens"),
      floor(TextFunctions.qualityScore(col("text")) * 1000).cast("int").as("lvl"))

  test("stratifiedSampleHash: per-stratum rates hit within tolerance, deterministic, edge rates exact") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = TrainingDataPipeline.stratifiedSampleHash(
      docs, "lang", Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)
    val got = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(l: String) = got.getOrElse(l, 0L).toDouble / total(l)
    assert(math.abs(rate("en") - 0.5) < 0.1, s"en ${rate("en")}")
    assert(math.abs(rate("de") - 0.25) < 0.1, s"de ${rate("de")}")
    total.keys.filterNot(Set("en", "de")).foreach(l =>
      assert(math.abs(rate(l) - 0.1) < 0.08, s"$l ${rate(l)}"))
    // deterministic: the same call selects the same ROWS, not just counts
    val again = TrainingDataPipeline.stratifiedSampleHash(
      docs, "lang", Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
    // a subset relation holds across rates: raising en's rate only ADDS
    val wider = TrainingDataPipeline.stratifiedSampleHash(
      docs, "lang", Map("en" -> 0.9, "de" -> 0.25), defaultFraction = 0.1)
    assert(sampled.exceptAll(wider).isEmpty)
    // rate 1.0 keeps every row; rate 0.0 keeps none
    val all = TrainingDataPipeline.stratifiedSampleHash(
      docs, "lang", Map("en" -> 1.0), defaultFraction = 0.0)
    assert(all.count() == total("en"))
    assert(all.filter(col("lang") =!= "en").isEmpty)
  }

  test("interleaveByWeight: prefixes hold sources in weight ratio, layout-independent") {
    import spark.implicits._
    val docs = (0L until 700L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val weights = Map("0" -> 1.0, "1" -> 2.0, "2" -> 4.0)
    def run(df: org.apache.spark.sql.DataFrame) =
      TrainingDataPipeline.interleaveByWeight(
        df, col("doc_id") % 3, weights, Seq(col("doc_id")))
        .select("doc_id", "grp", "interleave_key").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val rows = run(docs)
    assert(rows.length > 600) // every doc of a listed group labeled
    // the first 70 positions of the interleaved order hold ~1:2:4
    val prefix = rows.sortBy(_._3).take(70).groupBy(_._2).view.mapValues(_.length).toMap
    assert(prefix("0") >= 7 && prefix("0") <= 13, prefix.toString)
    assert(prefix("1") >= 16 && prefix("1") <= 24, prefix.toString)
    assert(prefix("2") >= 35 && prefix("2") <= 45, prefix.toString)
    // deterministic under physical layout changes
    assert(run(docs.repartition(13)).sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    // unlisted groups are dropped
    val partial = TrainingDataPipeline.interleaveByWeight(
      docs, col("doc_id") % 3, Map("0" -> 1.0), Seq(col("doc_id")))
    assert(partial.select("grp").distinct().collect().map(_.getString(0)).toSeq == Seq("0"))
  }

  test("temperatureWeights: alpha=1 natural, alpha=0 uniform, low alpha upsamples small sources") {
    import spark.implicits._
    val sizes = Map("big" -> 900L, "mid" -> 90L, "small" -> 10L)
    def w(alpha: Double) = TrainingDataPipeline.temperatureWeights(sizes, alpha)
    // alpha=1: natural proportions
    val nat = w(1.0)
    assert(math.abs(nat("big") - 0.9) < 1e-12 && math.abs(nat("small") - 0.01) < 1e-12)
    // alpha=0: uniform
    val uni = w(0.0)
    assert(uni.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
    // the standard 0.3 temperature: small source's share grows, big shrinks
    val t = w(0.3)
    assert(t("small") > nat("small") && t("big") < nat("big"))
    assert(math.abs(t.values.sum - 1.0) < 1e-12)
    // composes with the interleave: a temperature-weighted prefix holds
    // more of the small source than the natural mix would
    val docs = ((0L until 180L).map(i => (i, "big")) ++
      (1000L until 1018L).map(i => (i, "small"))).toDF("doc_id", "src")
    val tw = TrainingDataPipeline.temperatureWeights(
      Map("big" -> 180L, "small" -> 18L), 0.3)
    val prefix = TrainingDataPipeline.interleaveByWeight(
      docs, col("src"), tw, Seq(col("doc_id")))
      .orderBy("interleave_key").limit(40)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // natural mix would give ~3-4 small docs in 40; temperature 0.3
    // roughly doubles the small share
    assert(prefix.getOrElse("small", 0L) >= 7, prefix.toString)
  }

  test("tokenBudgetSelect matches the greedy (level desc, doc_id asc) reference") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val budget = 20000L
    val rows = scored.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tokens"), r.getAs[Int]("lvl")))
    // local greedy reference: fill whole levels from the top; order the
    // boundary level by doc id and take while the running sum fits
    val expected = scala.collection.mutable.Set.empty[Long]
    var acc = 0L
    var stop = false
    for (lvlGroup <- rows.groupBy(_._3).toSeq.sortBy(-_._1) if !stop) {
      val (lvl, members) = lvlGroup
      val levelTotal = members.map(_._2).sum
      if (acc + levelTotal <= budget) {
        expected ++= members.map(_._1); acc += levelTotal
      } else {
        var run = 0L
        members.sortBy(_._1).foreach { case (id, t, _) =>
          run += t
          if (run <= budget - acc) expected += id
        }
        stop = true
      }
    }
    val got = TrainingDataPipeline.tokenBudgetSelect(docs, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected.toSet,
      s"missing ${expected.toSet -- got}, extra ${got -- expected}")
    // and the budget is respected but not wastefully underfilled
    val spent = rows.filter(r => got.contains(r._1)).map(_._2).sum
    assert(spent <= budget, s"budget exceeded: $spent")
  }

  test("contaminationReport flags 8-token overlap, ignores 7-token overlap") {
    import spark.implicits._
    val evalSet = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains eval tokens 1..8 verbatim -> contaminated
      (10L, "noise alpha beta gamma delta epsilon zeta eta theta more noise"),
      // only a 7-token run (beta..theta minus one) -> clean
      (11L, "beta gamma delta epsilon zeta eta theta"),
      (12L, "completely unrelated words about query planners and shuffles")
    ).toDF("doc_id", "text")
    val flagged = TrainingDataPipeline.contaminationReport(corpus, evalSet)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shared_grams")).toMap
    assert(flagged.contains(10L) && flagged(10L) >= 1, flagged.toString)
    assert(!flagged.contains(11L), flagged.toString) // 7 < n=8: below the guarantee
    assert(!flagged.contains(12L))
  }

  test("tokenBudgetSelect returns everything when the budget covers the corpus") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val total = scored.agg(sum("tokens")).head().getLong(0)
    val got = TrainingDataPipeline.tokenBudgetSelect(docs, total + 1)
    assert(got.count() == docs.count())
  }

  test("tokenBudgetByGroup respects each group's budget independently") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val budgets = Map("0" -> 8000L, "1" -> 5000L, "2" -> 2000L)
    val out = TrainingDataPipeline
      .tokenBudgetByGroup(docs, col("doc_id") % 3, budgets)
      .groupBy("grp").agg(sum("tokens").as("spent")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    budgets.foreach { case (g, b) =>
      assert(out.getOrElse(g, 0L) <= b, s"group $g overspent: ${out.get(g)} > $b")
      assert(out.getOrElse(g, 0L) > 0L, s"group $g selected nothing")
    }
    // an unlisted group is dropped entirely
    val dropped = TrainingDataPipeline
      .tokenBudgetByGroup(docs, col("doc_id") % 3, Map("0" -> 8000L))
      .select("grp").distinct().collect().map(_.getString(0)).toSet
    assert(dropped == Set("0"))
  }

  test("tokenBudget scans documents once: output reads the persisted scored frame") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val out = TrainingDataPipeline.tokenBudgetSelect(docs, 20000L)
    // the histogram action already materialized the cache, so the
    // returned plan must read InMemoryRelation, not re-scan parquet
    val optimized = out.queryExecution.optimizedPlan
    val cached = optimized.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    val scans = optimized.collect {
      case l: org.apache.spark.sql.catalyst.catalog.HiveTableRelation => l
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(cached.nonEmpty, s"expected InMemoryRelation in:\n$optimized")
    assert(scans.isEmpty, s"documents re-scanned despite cache:\n$optimized")
    assert(out.count() > 0)
    TrainingDataPipeline.releaseCaches()
    // opt-out path still computes the same rows (second scan, no cache)
    val plain = TrainingDataPipeline.tokenBudgetSelect(docs, 20000L, persistScored = false)
    assert(plain.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }.isEmpty)
    assert(plain.select("doc_id").collect().map(_.getLong(0)).toSet ==
      out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("packSequences: greedy next-fit per bucket, budget respected, matches local reference") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val maxSeq = 512L
    val out = TrainingDataPipeline.packSequences(
      docs, maxSeq, bucketExpr = Some(col("doc_id") % 8))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket"),
        r.getAs[Long]("pack_in_bucket"), r.getAs[Long]("pack_id"), r.getAs[Long]("tokens")))
    // every pack fits the budget
    out.groupBy(r => (r._2, r._3)).foreach { case (pack, members) =>
      val s = members.map(_._5).sum
      assert(s <= maxSeq, s"pack $pack holds $s > $maxSeq tokens")
    }
    // greedy property: the first doc of pack p+1 would NOT have fit in pack p
    out.groupBy(_._2).foreach { case (b, members) =>
      val byPack = members.groupBy(_._3).toSeq.sortBy(_._1)
      byPack.sliding(2).foreach {
        case Seq((_, cur), (_, next)) =>
          val firstNext = next.minBy(_._1)
          assert(cur.map(_._5).sum + firstNext._5 > maxSeq,
            s"bucket $b: pack split though doc ${firstNext._1} would have fit")
        case _ =>
      }
    }
    // local greedy reference over the same (bucket, id-order) streams
    val toks = scored.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tokens"))).toMap
    val expected = toks.filter(_._2 <= maxSeq).toSeq
      .map { case (id, t) => (id, id % 8, t) }
      .groupBy(_._2).flatMap { case (b, members) =>
        var acc = 0L; var pack = 0L
        members.sortBy(_._1).map { case (id, _, t) =>
          if (acc + t > maxSeq) { pack += 1; acc = 0L }
          acc += t
          (id, b, pack)
        }
      }.toSet
    assert(out.map(r => (r._1, r._2.toLong, r._3)).toSet == expected)
    // pack_id is globally unique per (bucket, pack)
    assert(out.map(r => (r._2, r._3)).distinct.length == out.map(_._4).distinct.length)
    // deterministic under physical layout changes
    val re = TrainingDataPipeline.packSequences(
      docs.repartition(13), maxSeq, bucketExpr = Some(col("doc_id") % 8))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pack_id"))).toSet
    assert(re == out.map(r => (r._1, r._4)).toSet)
  }

  test("packSequences keeps non-numeric doc ids (string ids pack in lexical order)") {
    import spark.implicits._
    val docs = Seq(
      ("doc-a", "one two three"), ("doc-b", "four five"),
      ("doc-c", "six"), ("doc-d", "seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = TrainingDataPipeline.packSequences(
      docs, maxSeqTokens = 5, bucketExpr = Some(lit(0)),
      conf = TrainingDataPipeline.Config())
      .collect().map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("pack_in_bucket")))
      .toMap
    // lexical id order: a(3) b(2) -> pack 0 full at 5; c(1) d(4) -> pack 1
    assert(out == Map("doc-a" -> 0L, "doc-b" -> 0L, "doc-c" -> 1L, "doc-d" -> 1L), out.toString)
  }

  test("tokenBudgetSelect plans no global-order window (only the boundary level sorts)") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    // a Window with an EMPTY partition spec = a single-partition global
    // sort — the scale killer the bucket-histogram plan exists to avoid;
    // the one allowed window partitions by the boundary (grp, lvl)
    val windows = TrainingDataPipeline.tokenBudgetSelect(docs, 20000L)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"global-order window in plan: $w")
    }
  }
}
