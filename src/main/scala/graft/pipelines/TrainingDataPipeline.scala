package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextFunctions

/** End-to-end training-data cleaning: the composition the extension
  * operators exist for. Stage order is the standard
  * cheapest-filter-first arrangement — per-row scoring before any
  * shuffle, exact dedup (one shuffle on the fingerprint) before
  * near-dedup (banded LSH), so each stage sees the smallest possible
  * input.
  *
  *   quality gate → language gate → exact dedup → MinHash near-dedup
  *
  * Every stage is a DataFrame → DataFrame function; at 100 TB the
  * composition is one lazy plan and Catalyst pipelines the per-row
  * stages into the scan.
  */
object TrainingDataPipeline {

  case class Config(
      minQuality: Double = 0.3,
      keepLangs: Set[String] = Set("en"),
      minhashThreshold: Double = 0.8,
      idCol: String = "doc_id",
      textCol: String = "text")

  // Caches created by library functions (tokenBudget's scored frame).
  // The cached plan must outlive the function call — the returned
  // DataFrame reads it — so release is explicit and caller-driven.
  private val liveCaches =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())
  private[graft] def registerCache(df: DataFrame): Unit = liveCaches.add(df)

  /** Unpersist every cache a pipeline function registered. Call after
    * the returned plans are fully consumed (non-blocking; a plan acted
    * on afterwards recomputes — correct, just slower).
    *
    * Scope contract: the registry is PROCESS-GLOBAL, so this releases
    * caches registered by EVERY in-flight pipeline call, not just the
    * caller's — under concurrent drivers one caller's release evicts
    * another's scored frame (results stay correct; that pipeline
    * silently loses its single-scan guarantee and recomputes). Serialize
    * release with pipeline use, or pass `persistScored = false` to the
    * concurrent callers instead.
    */
  def releaseCaches(): Unit = {
    liveCaches.synchronized {
      liveCaches.forEach(df => { df.unpersist(false); () })
      liveCaches.clear()
    }
  }

  /** Deterministic STRATIFIED sampling — per-stratum keep rates with
    * content-hash reproducibility (the corpus-mixture knob: "keep 50%
    * of en, 25% of de, 10% of the rest", stable across runs, engines
    * and partitionings, unlike `sample()`'s seeded RNG which is
    * partitioning-dependent). Mechanism: the first 8 hex chars of
    * md5(content) are a uniform 32-bit draw, and FIXED-WIDTH lowercase
    * hex compares lexicographically exactly as it does numerically
    * ('0'-'9' < 'a'-'f' in ASCII), so `hex8 < threshold(stratum)` is a
    * pure string predicate any engine evaluates identically — the
    * DuckDB oracle runs the same CASE. Rate r maps to the hex of
    * ⌊r·2³²⌋ (r ≥ 1 keeps all via a sentinel above every hex digit;
    * r ≤ 0 keeps none). Map-only: no shuffle, no state, trivially
    * 100 TB-parallel.
    */
  def stratifiedSampleHash(
      docs: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      contentCol: String = "text"): DataFrame = {
    def thr(f: Double): String =
      if (f >= 1.0) "g" // sorts after every hex char: keep all
      else if (f <= 0.0) "" // nothing sorts below the empty string
      else f"${(f * 4294967296.0).toLong}%08x"
    val thresholdCol = fractions.foldLeft(lit(thr(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(thr(f))).otherwise(acc)
    }
    docs.filter(substring(md5(col(contentCol)), 1, 8) < thresholdCol)
  }

  def qualityGate(docs: DataFrame, conf: Config): DataFrame =
    docs.filter(TextFunctions.qualityScore(col(conf.textCol)) >= conf.minQuality)

  def languageGate(docs: DataFrame, conf: Config): DataFrame =
    docs.filter(TextFunctions.langId(col(conf.textCol))
      .isin(conf.keepLangs.toSeq: _*))

  def clean(docs: DataFrame, conf: Config = Config()): DataFrame = {
    val gated = languageGate(qualityGate(docs, conf), conf)
    val exact = Dedup.exactDedup(gated, conf.idCol, conf.textCol)
    Dedup.minhashDedup(exact, conf.idCol, conf.textCol, conf.minhashThreshold)
  }

  /** Select the highest-quality documents until a token budget fills —
    * the data-mixing primitive for training-set assembly ("take the
    * best N tokens"). A naive global quality-ordered running sum is a
    * single-partition window — the classic scale killer — so instead:
    * quality quantizes into `buckets` integer levels; the per-level
    * token histogram (≤ buckets+1 rows, one aggregation) finds the
    * boundary level on the driver; whole levels above the boundary are
    * kept with a plain filter (no ordering at all), and ONLY the
    * boundary level is ordered (by doc id) for the partial take — its
    * window is bounded by that one level's population. Deterministic:
    * (level desc, doc_id asc) is a total order. If the quality
    * distribution collapses into one level, raise `buckets`.
    */
  /** Cluster-balanced ("diversity" / topic-balanced) sampling: assign
    * every embedding to its nearest centroid and keep at most
    * `perCluster` rows per cell — the curation move that stops one
    * dominant topic from crowding a sample (the cluster-equal-share
    * counterpart of [[interleaveByWeight]]'s source mixing). Modes:
    * `hash` = unbiased deterministic per-cell sample (seed-key hash
    * order — [[graft.ops.RelationalOps.stratifiedSample]]);
    * `central` = the most prototypical members (highest cosine to the
    * own centroid, ties to the lower id); `edge` = the least
    * prototypical (SemDeDup's informative-edge rule as a sampler).
    * Centroids are injected (the quantizer seam shared with
    * [[graft.similarity.SemDedup]]/[[graft.similarity.IndexStore]]):
    * production trains them via Ivf.build; a frozen list makes the
    * decision pure algebra an oracle can replay.
    *
    * 100 TB shape: assignment is the one broadcast-matrix expression
    * per row (no shuffle), the per-cell selection is one shuffle on
    * cell id + a rank-limited window (Spark's WindowGroupLimit keeps
    * it map-side bounded) — no all-pairs term anywhere; output is at
    * most nClusters × perCluster rows.
    */
  def clusterBalancedSample(
      vectors: DataFrame,
      centroids: Array[Array[Float]],
      perCluster: Int,
      mode: String = "hash",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      portableHash: Boolean = false): DataFrame = {
    require(perCluster > 0, s"perCluster must be > 0, got $perCluster")
    val assigned =
      graft.similarity.Ivf.assign(centroids, vectors, idCol, vecCol)
    mode match {
      case "hash" =>
        graft.ops.RelationalOps.stratifiedSample(
          assigned.select("id", "cell"), Seq("cell"), perCluster,
          Seq("id"), portableHash)
          .select(col("id").as(idCol), col("cell"))
      case "central" | "edge" =>
        val spark = vectors.sparkSession
        import spark.implicits._
        val cdf = centroids.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cvec")
        val scored = assigned.join(broadcast(cdf), Seq("cell"))
          .withColumn("csim",
            graft.similarity.Ann.cosine(col("vec"), col("cvec")))
        val ord =
          if (mode == "central") Seq(col("csim").desc, col("id").asc)
          else Seq(col("csim").asc, col("id").asc)
        graft.ops.RelationalOps
          .topKPerGroup(scored, Seq("cell"), ord, perCluster)
          .select(col("id").as(idCol), col("cell"))
      case other => throw new IllegalArgumentException(
        s"clusterBalancedSample: unknown mode '$other' " +
          "(hash, central, edge)")
    }
  }

  def tokenBudgetSelect(
      docs: DataFrame,
      budgetTokens: Long,
      buckets: Int = 1000,
      conf: Config = Config(),
      persistScored: Boolean = true): DataFrame =
    tokenBudgetByGroup(docs, lit("all"), Map("all" -> budgetTokens), buckets, conf,
      persistScored)
      .select(col(conf.idCol), col("tokens"), col("lvl"))

  /** Per-group token budgets — the mixture-weights form of
    * [[tokenBudgetSelect]] ("30% source A, 70% source B" training-set
    * assembly): each group listed in `budgets` fills its own token
    * budget with its highest-quality documents; unlisted groups are
    * dropped. Same bucket-histogram plan, per group: the (group ×
    * level) token histogram (≤ |groups|·(buckets+1) rows) resolves
    * each group's boundary level on the driver, boundaries broadcast
    * back, whole levels keep by filter, and only each group's single
    * boundary level sorts for the partial take.
    *
    * Single-scan: the scored projection feeds TWO consumers — the
    * histogram action and the returned plan — so by default it
    * persists (MEMORY_AND_DISK; four narrow columns, a small fraction
    * of the corpus) and `documents` is scanned and regex-scored
    * exactly once. The cache is an explicit library side effect, so
    * the lifecycle is caller-controlled: it is registered under
    * [[releaseCaches]] for bulk release, and `persistScored = false`
    * opts out entirely (second scan instead of cache — the right
    * trade when the output is consumed once and memory is tight).
    */
  def tokenBudgetByGroup(
      docs: DataFrame,
      groupExpr: org.apache.spark.sql.Column,
      budgets: Map[String, Long],
      buckets: Int = 1000,
      conf: Config = Config(),
      persistScored: Boolean = true): DataFrame = {
    require(budgets.nonEmpty, "no group budgets given")
    val spark = docs.sparkSession
    import spark.implicits._
    // scope to budgeted groups FIRST: bounds the collected histogram to
    // |budgets|·(buckets+1) rows no matter the group column's
    // cardinality, and the filter pushes into the scan
    val scored0 = docs
      .filter(groupExpr.cast("string").isin(budgets.keys.toSeq: _*))
      .select(
        col(conf.idCol),
        groupExpr.cast("string").as("grp"),
        TextFunctions.tokenCount(col(conf.textCol)).cast("long").as("tokens"),
        floor(TextFunctions.qualityScore(col(conf.textCol)) * buckets)
          .cast("int").as("lvl"))
    val scored =
      if (persistScored) {
        val p = scored0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        registerCache(p)
        p
      } else scored0
    val hist = scored.groupBy("grp", "lvl").agg(sum("tokens").as("t")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val boundaries = budgets.toSeq.map { case (g, budget) =>
      val levels = hist.filter(_._1 == g).map(h => (h._2, h._3)).sortBy(-_._1)
      var acc = 0L
      var boundary = Int.MinValue // sentinel: everything fits, no partial level
      var boundaryBudget = 0L
      var done = false
      for ((lvl, t) <- levels if !done) {
        if (acc + t <= budget) acc += t
        else { boundary = lvl; boundaryBudget = budget - acc; done = true }
      }
      (g, boundary, boundaryBudget)
    }
    val bdf = broadcast(boundaries.toDF("grp", "boundary", "bbud"))
    val joined = scored.join(bdf, Seq("grp"))
    val full = joined.filter(col("lvl") > col("boundary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp", "lvl").orderBy(col(conf.idCol))
    val partial = joined.filter(col("lvl") === col("boundary"))
      .withColumn("__run", sum(col("tokens")).over(w))
      .filter(col("__run") <= col("bbud"))
      .drop("__run")
    full.unionByName(partial)
      .select(col(conf.idCol), col("grp"), col("tokens"), col("lvl"))
  }

  /** Greedy next-fit sequence packing — assign documents to
    * fixed-token-budget packs (pretraining context windows): scan each
    * bucket's documents in id order, accumulate until adding the next
    * doc would exceed `maxSeqTokens`, then open a new pack. Documents
    * longer than the window are dropped (they cannot pack whole;
    * truncation is a caller policy, not a packing concern).
    *
    * Scale shape: docs hash into `nBuckets` independent packing
    * streams (packing is embarrassingly parallel across buckets — the
    * only cross-doc dependency is within a bucket), then ONE shuffle:
    * `repartition(bucket)` + `sortWithinPartitions(bucket, id)` +
    * a streaming `mapPartitions` scan. The sort is Spark's external
    * (spilling) sort and the scan holds O(1) state — no bucket is ever
    * materialized in memory, so bucket sizing affects parallelism, not
    * correctness. Deterministic: (bucket, id) is a total order.
    *
    * Output: (idCol, bucket, pack_in_bucket, pack_id, tokens) where
    * `pack_id = bucket · 2³² + pack_in_bucket` is globally unique.
    * `bucketExpr` defaults to xxhash64(id) mod nBuckets; pass any
    * grouping column (e.g. a portable hash, or a source/domain key) to
    * control which documents may share a pack.
    */
  def packSequences(
      docs: DataFrame,
      maxSeqTokens: Long,
      nBuckets: Int = 1024,
      bucketExpr: Option[org.apache.spark.sql.Column] = None,
      conf: Config = Config()): DataFrame = {
    require(maxSeqTokens >= 1, "maxSeqTokens must be positive")
    val bucket = bucketExpr.getOrElse(pmod(xxhash64(col(conf.idCol)), lit(nBuckets)))
    val base = docs.select(
      col(conf.idCol).as("id"),
      bucket.cast("int").as("bucket"),
      TextFunctions.tokenCount(col(conf.textCol)).cast("long").as("tokens"))
      .filter(col("tokens") <= maxSeqTokens)
    // Row-generic scan (no cast of the id column): ids keep their own
    // type and ordering — string doc ids are as common as numeric ones
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        conf.idCol, base.schema("id").dataType, base.schema("id").nullable),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("pack_in_bucket",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pack_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("tokens",
        org.apache.spark.sql.types.LongType, nullable = false)))
    base
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")
      .mapPartitions { iter =>
        // several buckets per partition; state resets on bucket change
        var curBucket = Integer.MIN_VALUE
        var acc = 0L
        var pack = 0L
        iter.map { r =>
          val b = r.getInt(1)
          val tok = r.getLong(2)
          if (b != curBucket) { curBucket = b; acc = 0L; pack = 0L }
          if (acc + tok > maxSeqTokens) { pack += 1; acc = 0L }
          acc += tok
          org.apache.spark.sql.Row(r.get(0), b, pack, (b.toLong << 32) | pack, tok)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** Deterministic weighted source interleaving — the training-ORDER
    * side of data mixing ([[tokenBudgetByGroup]] decides WHAT to
    * include; this decides WHEN it appears): row p (1-based, ordered
    * by `orderCols` within its group) of a weight-w source gets
    * `interleave_key = (p - 0.5) / w`, so ordering by the key yields
    * the proportional interleave — any prefix of the stream holds the
    * sources in ≈ weight ratio (a weight-2 source appears twice as
    * often as a weight-1 source from the very start, rather than
    * block-concatenated). Groups not listed in `weights` are dropped.
    *
    * Scale shape: one shuffle on the group key (each group ranks
    * locally — the same exchange any per-group op pays), then a pure
    * projection; the GLOBAL order is never materialized here —
    * consumers sort or range-partition by `interleave_key` when
    * writing the final stream, which is Spark's distributed sample-
    * based range sort, not a single-task window. Deterministic:
    * `orderCols` must be a row key within each group.
    */
  def interleaveByWeight(
      docs: DataFrame,
      groupExpr: org.apache.spark.sql.Column,
      weights: Map[String, Double],
      orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"bad interleave weights: $weights")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF("grp", "__w"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(orderCols: _*)
    docs
      .withColumn("grp", groupExpr.cast("string"))
      .join(wdf, Seq("grp"))
      .withColumn("pos", row_number().over(w))
      .withColumn("interleave_key",
        (col("pos").cast("double") - lit(0.5)) / col("__w"))
      .drop("__w")
  }

  /** Temperature-scaled mixture weights — the multilingual-corpus
    * sampling rule (p_i ∝ n_i^α, exponentiated-size normalization as
    * in the mBERT/XLM-R/mT5 recipes): source sizes in,
    * [[interleaveByWeight]]-ready weights out. α = 1 keeps natural
    * proportions (big sources dominate); α → 0 flattens toward
    * uniform (small sources upsample); the papers' usual range is
    * 0.2-0.7. Pure driver-side arithmetic over the per-source counts
    * the caller already has (one groupBy if not).
    */
  def temperatureWeights(sizes: Map[String, Long], alpha: Double): Map[String, Double] = {
    require(sizes.nonEmpty && sizes.values.forall(_ > 0), s"bad sizes: $sizes")
    require(alpha >= 0.0, s"alpha must be non-negative, got $alpha")
    val scaled = sizes.map { case (k, n) => k -> math.pow(n.toDouble, alpha) }
    val total = scaled.values.sum
    scaled.map { case (k, v) => k -> v / total }
  }

  /** Benchmark decontamination: flag corpus documents that share any
    * `n`-token shingle with the evaluation set — the standard guard
    * against test-set leakage into training data. Scale shape: the
    * eval side is small by definition, so its distinct gram set
    * BROADCASTS; the corpus side is one scan + per-row shingling +
    * broadcast hash join — the 100 TB corpus never shuffles. Returns
    * (idCol, shared_grams) for contaminated docs only; compose with a
    * left_anti join to drop them.
    */
  def contaminationReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      n: Int = 8,
      conf: Config = Config()): DataFrame = {
    val evalGrams = evalSet.select(
      explode(array_distinct(TextFunctions.wordShingles(col(conf.textCol), n)))
        .as("gram")).distinct()
    corpus.select(col(conf.idCol),
      explode(array_distinct(TextFunctions.wordShingles(col(conf.textCol), n)))
        .as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(conf.idCol)
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** Per-stage survival counts — the pipeline's observability story.
    *
    * The two per-row gates are counted in ONE scan with conditional
    * aggregation (a naive count-per-stage would rescan the input once
    * per stage), and the gated/deduped frames are persisted so the
    * shuffle stages (exact dedup, minhash LSH) each read their input
    * exactly once.
    *
    * `nearDupPairs` swaps the near-dedup candidate generator: given the
    * exact-dedup survivors it returns candidate pairs whose `id_b` is
    * the higher-id (dropped) member. Default is the production MinHash
    * LSH pass; the oracle twin injects the engine-portable md5 variant
    * so the funnel composition itself is hash-checkable end-to-end.
    */
  def funnel(
      docs: DataFrame,
      conf: Config = Config(),
      nearDupPairs: Option[DataFrame => DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qPass = TextFunctions.qualityScore(col(conf.textCol)) >= conf.minQuality
    val lPass = TextFunctions.langId(col(conf.textCol)).isin(conf.keepLangs.toSeq: _*)
    val Array(n0, n1, n2) = docs
      .agg(count(lit(1)), count_if(qPass), count_if(qPass && lPass))
      .first().toSeq.map(_.asInstanceOf[Long]).toArray
    val gated = docs.filter(qPass && lPass).persist()
    val e = Dedup.exactDedup(gated, conf.idCol, conf.textCol).persist()
    val n3 = e.count()
    // survivors = input minus docs with a lower-id near-dup; counting the
    // (small) drop set avoids materializing the anti-join over all docs
    val candidates = nearDupPairs.getOrElse((survivors: DataFrame) =>
      Dedup.minhashCandidates(survivors, conf.idCol, conf.textCol,
        threshold = conf.minhashThreshold))
    val n4 = n3 - candidates(e).select("id_b").distinct().count()
    val out = Seq(
      ("0_input", n0), ("1_quality", n1), ("2_language", n2),
      ("3_exact_dedup", n3), ("4_near_dedup", n4))
      .toDF("stage", "docs")
    gated.unpersist()
    e.unpersist()
    out
  }
}
