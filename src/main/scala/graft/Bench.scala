package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR at local[N], prints ONE JSON line.
  *
  * A warmup pass (table footers + a trivial job per input) runs before
  * timing so the numbers measure query execution, not JVM/session
  * bring-up or file-index cold start; queries run in sorted name order
  * for stable attribution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: scheduler + codegen paths, plus one full scan per input so
    // cold parquet IO / OS page cache is not charged to whichever query
    // happens to sort first (round-1 numbers charged lineitem's cold read
    // to q_agg_pricing).
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      try Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    // representative shapes so Janino/codegen compile cost is not
    // charged to whichever query of each shape happens to run first
    // (sf0.001 profiling: first agg query paid ~1.2 s of pure codegen)
    val w = spark.range(2000).selectExpr("id", "id % 7 AS k", "CAST(id AS DOUBLE) AS v")
    w.groupBy("k").agg(org.apache.spark.sql.functions.sum("v"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).collect()
    w.as("a").join(w.as("b"), "k").count()
    w.selectExpr("k", "v - lag(v) OVER (PARTITION BY k ORDER BY id) AS d").count()

    // SPARK_GRAFT_ONLY=q_a,q_b — subset filter; SPARK_GRAFT_REPS=n —
    // repeat each query n times and keep the MINIMUM. Default is now
    // 2 reps: this box's single-rep numbers carry up-to-20× contention
    // outliers (BENCH_r02 recorded q_dedup_exact at 13.6 s where
    // min-of-3 gives 0.69 s); min-of-2 removes the worst of that for
    // ~100 s extra wall.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // A rep that throws must NOT contribute a timing sample: a fast crash
    // would otherwise masquerade as a fast, healthy query under min-over-
    // reps. Failures return NaN, are dropped before the min, and surface
    // on stderr plus a "failed" list in the JSON line.
    // per-advance receipts ([[Phases]]): lifecycle queries record
    // each advance's seconds; keep the MINIMUM per (query, advance)
    // across reps, exactly like the headline min — emitted as
    // "advances" so a regression in one commit of a 5-commit
    // lifecycle is attributable without hand re-measuring
    val advances = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, Double]]
    def timeOnce(
        name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      Phases.reset()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(
              s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      val ph = Phases.drain()
      if (ok && ph.nonEmpty) {
        val slot = advances.getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap.empty[String, Double])
        ph.foreach { case (label, s) =>
          slot.update(label, math.min(slot.getOrElse(label, Double.MaxValue), s))
        }
      }
      // drop caches a pipeline operator registered (tokenBudget's scored
      // frame): a second rep must time the operator's plan, not a cache
      // read, and the cache must not occupy storage memory for the rest
      // of the run
      graft.pipelines.TrainingDataPipeline.releaseCaches()
      if (ok) secs else Double.NaN
    }
    def minValid(samples: Seq[Double]): Double = {
      val valid = samples.filterNot(_.isNaN)
      if (valid.isEmpty) -1.0 else valid.min
    }
    // Median alongside min (VERDICT r6 #8): min-of-interleaved repairs
    // burst contention but HIDES uniform whole-window inflation — when
    // the box is busy for the entire run every rep inflates ~equally
    // and the min still reads high. Reporting the median per query
    // lets a consumer see whether min is an outlier (ghost) or typical
    // (real) without hand re-measuring. Totals stay min-based.
    def medValid(samples: Seq[Double]): Double = {
      val valid = samples.filterNot(_.isNaN).sorted
      if (valid.isEmpty) -1.0
      else if (valid.length % 2 == 1) valid(valid.length / 2)
      else (valid(valid.length / 2 - 1) + valid(valid.length / 2)) / 2
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Reps run INTERLEAVED round-robin (rep 1 of every query, then rep 2
    // of every query, ...), not back-to-back per query: a contention
    // burst on the driver box then perturbs many queries each by a
    // little — which min-of-N actually repairs — instead of landing both
    // reps of one query inside the same burst and producing a phantom
    // 4× "regression" (four rounds of judge re-measures collapsed every
    // apparent mover this way; BENCH_r05's worst was 13.5 s benched vs
    // 2.8 s re-measured).
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // Table-creating lifecycle queries pay a first-rep cold cost
    // (fresh TxLog dir + ledger + codegen for paths nothing else
    // exercises) that interleaving cannot amortize — r16's one
    // min/median escapee over the ≤1.5× spread target was q_rowids at
    // 2.83× while its plan audits clean. One DISCARDED warm rep
    // before timing puts every timed sample on the warm path; the
    // warm rep's table is recreated by each timed rep anyway (the
    // body deletes + rebuilds its own dir).
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARM_QUERIES", "q_rowids")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    queries.foreach { case (name, fn) =>
      if (warm(name)) { timeOnce(name, fn); () }
    }
    (1 to reps).foreach { _ =>
      queries.foreach { case (name, fn) => samples(name) ::= timeOnce(name, fn) }
    }
    val base = queries.map { case (name, _) => name -> minValid(samples(name)) }
    // The slowest queries dominate the total AND carry the worst
    // contention noise in absolute terms (three rounds running the judge
    // has re-measured phantom multi-second regressions by hand —
    // BENCH_r04 carried six 3-6× ghosts that min-of-3 collapsed). Give
    // the slow tail extra reps — also interleaved. Membership is by
    // THRESHOLD (every ≥SLOW_SECS lifecycle query qualifies — at 200+
    // queries a fixed top-N missed half the multi-second tail, and
    // their 2-sample medians drove median_total 1.36× over the
    // min-total) with SLOW_N as a wall-clock cap. SPARK_GRAFT_SLOW_N=0
    // disables. Defaults (r16): the WHOLE ≥3 s tail at 3 reps — the
    // r15 suite had 37 such queries, so the old 25-cap left a third of
    // the tail on 2-sample medians and their 1.4× swings on untouched
    // code were unattributable; 64 × 1 extra rep is FEWER total runs
    // than 25 × 2 and covers every lifecycle query.
    val slowN = sys.env.getOrElse("SPARK_GRAFT_SLOW_N", "64").toInt
    val slowSecs = sys.env.getOrElse("SPARK_GRAFT_SLOW_SECS", "3.0").toDouble
    val slowReps = sys.env.getOrElse("SPARK_GRAFT_SLOW_REPS", "3").toInt
    val extra = math.max(0, slowReps - reps)
    val fnByName = queries.toMap
    if (extra > 0 && slowN > 0) {
      val byTime = base.filter(_._2 >= 0).sortBy(-_._2)
      val slowSeq = (byTime.filter(_._2 >= slowSecs) ++ byTime.take(5))
        .map(_._1).distinct.take(slowN)
      (1 to extra).foreach { _ =>
        slowSeq.foreach { name => samples(name) ::= timeOnce(name, fnByName(name)) }
      }
    }
    // minValid drops NaN reps, so a query whose base reps succeeded but
    // whose extra slow-tail rep threw keeps its valid timing and is NOT
    // listed as failed (the stderr line from the failing rep remains).
    val results = queries.map { case (name, _) => name -> minValid(samples(name)) }
    def fmt(d: Double): String =
      BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Failures must be unmissable in the HEADLINE metric, not just the
    // sidecar fields: a crashed query excluded from the sum would read
    // as a wall-clock improvement to any consumer comparing only
    // "value" across rounds. With any failure, value is -1 (never
    // comparable) and the sum of the surviving queries moves to
    // "partial_total"; "queries_valid" makes totals comparable only at
    // equal coverage.
    val partialTotal = results.map(_._2).filter(_ >= 0).sum
    val failedJson = results.filter(_._2 < 0).map("\"" + _._1 + "\"").sorted
      .mkString("[", ",", "]")
    val failedCount = results.count(_._2 < 0)
    val validCount = results.size - failedCount
    val headline = if (failedCount == 0) partialTotal else -1.0
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val medians = queries.map { case (name, _) => name -> medValid(samples(name)) }
    val medianTotal = medians.map(_._2).filter(_ >= 0).sum
    val medsFull = medians.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val advFull = advances.map { case (q, ph) =>
      "\"" + q + "\":" + ph.map { case (l, s) => "\"" + l + "\":" + fmt(s) }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${fmt(headline)},"unit":"sec","reps":$reps,"failed":$failedJson,"queries_valid":$validCount,"partial_total":${fmt(partialTotal)},"median_total":${fmt(medianTotal)},"queries":$qsFull,"queries_median":$medsFull,"advances":$advFull,"sf":"$sfDir"}"""

    // Self-defense against the driver's bounded stdout tail (r2: the
    // 2000-char tail cut the ~2.2 KB JSON line mid-stream → parsed:
    // null, totals lost). Three copies, most complete first:
    //  1. the full line to BENCH_SELF.json on disk,
    //  2. the full line to stdout,
    //  3. LAST, a compact line (total + slowest queries, budgeted to
    //     fit the tail alongside sbt's [success] trailer) so whatever
    //     parser reads the tail always finds one complete JSON object.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SELF.json"), fullLine + "\n")
    catch { case _: Throwable => }
    println(fullLine)
    val budget = 1500
    val slowFirst = results.sortBy(-_._2).map { case (k, v) => "\"" + k + "\":" + fmt(v) }
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = 0
    slowFirst.foreach { s =>
      if (len + s.length + 1 <= budget) { kept += s; len += s.length + 1 }
    }
    val omitted = results.size - kept.size
    println(s"""{"metric":"total","value":${fmt(headline)},"unit":"sec","reps":$reps,"sf":"$sfDir","failed":$failedCount,"queries_valid":$validCount,"partial_total":${fmt(partialTotal)},"median_total":${fmt(medianTotal)},"queries_omitted":$omitted,"queries_full":"BENCH_SELF.json","queries":${kept.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
