package graft.dedup

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.ParquetStore
import org.apache.spark.sql.functions._

class DedupStateSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() =
    new ParquetStore(spark, Files.createTempDirectory("graft_dedupstate").toString)

  private def docsAt(dir: String) = graft.Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  private def docIds(store: ParquetStore, name: String): Seq[Long] =
    store.read(DedupState.docsTable(name)).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("state-backed incremental dedup equals minhashDedupIncremental on the same corpus") {
    val all = docsAt(sf("documents"))
    val corpus = Dedup.minhashDedup(all.filter(col("doc_id") < 60), threshold = 0.8)
    val batch = all.filter(col("doc_id") >= 60 && col("doc_id") < 120)
    val expected = Dedup.minhashDedupIncremental(batch, corpus, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(expected.nonEmpty) // the corpus is template-generated: dups exist
    val store = newStore()
    DedupState.init(store, "eq", corpus)
    // pure probe matches the batch-job semantics exactly
    val got = DedupState.dedupBatch(store, "eq", batch)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
    // and the mutating ingest lands exactly corpus ∪ survivors
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSeq
    DedupState.ingestBatch(store, "eq", batch)
    assert(docIds(store, "eq") == (corpusIds ++ expected).sorted)
  }

  test("replay is a no-op; later batches dedup against folded-in state") {
    val store = newStore()
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "completely different content about database engines and query optimizers"),
      (12L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 10
      (13L, "a third subject entirely: alpine meadows and the flowering season schedule")
    ).toDF("doc_id", "text")
    DedupState.ingestBatch(store, "st", b1) // cold start, no init
    assert(docIds(store, "st") == Seq(10L, 11L, 13L))
    val bandCount = store.read(DedupState.bandsTable("st")).count()
    // full replay: both tables unchanged
    DedupState.ingestBatch(store, "st", b1)
    assert(docIds(store, "st") == Seq(10L, 11L, 13L))
    assert(store.read(DedupState.bandsTable("st")).count() == bandCount)
    // batch 2: an exact dup of 10 (different id), a near dup of 11, a
    // novel doc, and an in-batch near pair (smaller id wins)
    val b2 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (21L, "completely different content about database engines and query optimizer"),
      (22L, "fresh unrelated material on tidal patterns and the lunar calendar cycle"),
      (23L, "fresh unrelated material on tidal patterns and the lunar calendar cycles")
    ).toDF("doc_id", "text")
    DedupState.ingestBatch(store, "st", b2, p = DedupState.Params(threshold = 0.5))
    assert(docIds(store, "st") == Seq(10L, 11L, 13L, 22L))
  }

  test("crash between the docs and bands appends heals on replay") {
    val store = newStore()
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about database engines and query optimizers")
    ).toDF("doc_id", "text")
    DedupState.ingestBatch(store, "cr", b1)
    val bandsT = DedupState.bandsTable("cr")
    val preBands = store.read(bandsT).localCheckpoint()
    val b2 = Seq(
      (3L, "a third subject entirely: alpine meadows and the flowering season schedule"),
      (4L, "fresh unrelated material on tidal patterns and the lunar calendar cycle")
    ).toDF("doc_id", "text")
    DedupState.ingestBatch(store, "cr", b2)
    val postBands = store.read(bandsT)
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    // simulate the crash: docs landed (keep), bands did not (rewind)
    store.overwritePartitioned(preBands, bandsT, "cell")
    assert(store.read(bandsT).count() < postBands.size)
    // replay: docs unchanged, bands healed to the full post-batch state
    DedupState.ingestBatch(store, "cr", b2)
    assert(docIds(store, "cr") == Seq(1L, 2L, 3L, 4L))
    assert(store.read(bandsT)
      .select("id").collect().map(_.getString(0)).sorted.toSeq == postBands)
    // and no duplicate state keys anywhere
    assert(graft.similarity.IndexStore
      .duplicateIdAudit(store, bandsT).isEmpty)
  }

  test("batch probe partition-prunes the band-state scan to touched shards") {
    val all = docsAt(sf("documents"))
    val store = newStore()
    DedupState.init(store, "pr", Dedup.exactDedup(all.filter(col("doc_id") < 40)))
    val batch = all.filter(col("doc_id") === 50)
    val plan = DedupState.dedupBatch(store, "pr", batch)
      .queryExecution.executedPlan.toString
    // the __bands read carries a partition filter on its shard column
    // (the one-doc batch touches at most `bands` shards)
    assert(plan.contains("__bands"), plan)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan)
  }

  test("compact collapses per-batch files; state contents identical") {
    val all = docsAt(sf("documents"))
    val store = newStore()
    DedupState.init(store, "cp", Dedup.exactDedup(all.filter(col("doc_id") < 20)))
    (20 until 50 by 10).foreach { lo =>
      DedupState.ingestBatch(store, "cp",
        all.filter(col("doc_id") >= lo && col("doc_id") < lo + 10))
    }
    val docsT = DedupState.docsTable("cp")
    def files(t: String) = store.read(t).inputFiles.length
    def ids() = docIds(store, "cp")
    val (beforeFiles, beforeIds) = (files(docsT), ids())
    val beforeBands = store.read(DedupState.bandsTable("cp"))
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(DedupState.compact(store, "cp", targetFileBytes = 512L * 1024 * 1024) > 0)
    assert(files(docsT) < beforeFiles)
    assert(ids() == beforeIds)
    assert(store.read(DedupState.bandsTable("cp"))
      .select("id").collect().map(_.getString(0)).sorted.toSeq == beforeBands)
  }

  test("fingerprint bloom sidecar: novel stream stays exact, replay still a no-op") {
    val all = docsAt(sf("documents"))
    val store = newStore()
    val corpus = Dedup.minhashDedup(all.filter(col("doc_id") < 40), threshold = 0.8)
    DedupState.init(store, "bl", corpus)
    DedupState.enableFpBloom(store, "bl", expectedIdsPerCell = 1024, fpp = 0.01)
    val batch = all.filter(col("doc_id") >= 40 && col("doc_id") < 80)
    val expected = Dedup.minhashDedupIncremental(batch, corpus, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    DedupState.ingestBatch(store, "bl", batch)
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(docIds(store, "bl") == (corpusIds ++ expected).sorted)
    DedupState.ingestBatch(store, "bl", batch) // replay through the bloom
    assert(docIds(store, "bl") == (corpusIds ++ expected).sorted)
    // sidecar bookkeeping followed the ingest
    val n = store.read(s"${DedupState.docsTable("bl")}__idbloom")
      .agg(sum(col("n_ids"))).head().getLong(0)
    assert(n == corpusIds.size + expected.size, s"sidecar counts $n")
  }

  test("band-value bloom thins the touched set; probe through it stays exact") {
    val all = docsAt(sf("documents"))
    val store = newStore()
    val corpus = Dedup.minhashDedup(all.filter(col("doc_id") < 40), threshold = 0.8)
    DedupState.init(store, "bb", corpus)
    DedupState.enableFpBloom(store, "bb", expectedIdsPerCell = 1024, fpp = 0.01)
    val p = DedupState.Params()
    // every band actually IN state survives the probe (no false negatives)
    val stateBands = store.read(DedupState.bandsTable("bb")).select("band").distinct()
    assert(DedupState.maybeTouchedBands(store, "bb", stateBands, p).count()
      == stateBands.count())
    // synthetic bands that exist nowhere thin out at ~fpp, BEFORE any
    // state read — absent bands cost a bloom probe, not a shard scan
    val absent = spark.range(1000).select((col("id") * 7919L + 1000000000L).as("band"))
    val leaked = DedupState.maybeTouchedBands(store, "bb", absent, p).count()
    assert(leaked < 100, s"bloom leaked $leaked of 1000 absent bands")
    // and the full probe through the band bloom is still exact
    val batch = all.filter(col("doc_id") >= 40 && col("doc_id") < 80)
    val expected = Dedup.minhashDedupIncremental(batch, corpus, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = DedupState.dedupBatch(store, "bb", batch)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
  }

  test("all-novel batch through the band bloom plans NO scan of the near state") {
    import spark.implicits._
    val all = docsAt(sf("documents"))
    val store = newStore()
    val corpus = Dedup.exactDedup(all.filter(col("doc_id") < 40))
    DedupState.init(store, "nv", corpus)
    DedupState.enableFpBloom(store, "nv", expectedIdsPerCell = 1024, fpp = 0.01)
    // synthetic content disjoint from every corpus shingle: its bands
    // are bloom-negative, so the near probe must touch no band shard
    val novel = (0 until 8).map(i =>
      (100000L + i, s"zq$i xv$i wk$i yj$i qqq$i zzz$i rrr$i ttt$i uuu$i"))
      .toDF("doc_id", "text")
    val probe = DedupState.dedupBatch(store, "nv", novel)
    // any mention of the bands table in the plan must be its bloom
    // sidecar (…__bands__bandbloom), never the state table itself
    val planStr = probe.queryExecution.executedPlan.toString
    assert("__bands(?!__bandbloom)".r.findFirstIn(planStr).isEmpty, planStr)
    // and the batch itself survives in full (genuinely novel)
    assert(probe.count() == 8)
  }
}
