package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.sources.TableStore
import graft.similarity.IndexStore
import graft.text.TextFunctions._

/** Corpus-scale incremental near-dedup STATE — the streaming twin of
  * [[Dedup.minhashDedupIncremental]], with the per-batch corpus cost
  * bounded the way the ANN ingest kernel bounds its id reads.
  *
  * `minhashDedupIncremental` is the right shape for a one-off
  * batch-vs-corpus job, but a STREAM of micro-batches cannot afford its
  * corpus side: it re-reads and re-shingles every corpus document per
  * batch — O(corpus) text scans per micro-batch. This module persists
  * the two things a batch actually probes as hash-sharded state tables
  * and prunes every probe to the batch's own shards:
  *
  *  - `<name>__docs` — the surviving corpus, keyed by content
  *    fingerprint (`id` = md5 fingerprint, `cell` = fingerprint
  *    shard): the EXACT-dedup state. Probed and maintained by the same
  *    [[IndexStore.newById]]/[[IndexStore.appendNewById]] kernel as the
  *    ANN index tables — shard-pruned anti-join, optional id-bloom
  *    sidecar ([[enableFpBloom]]) making mostly-novel batches read zero
  *    corpus fingerprints, idempotent replay. Fingerprint→shard is
  *    deterministic, so the kernel's content-stable-id contract holds
  *    by construction.
  *  - `<name>__bands` — one row per (LSH band, doc): the NEAR-dedup
  *    state, keyed `band|fp` (replay-idempotent under the same
  *    kernel), sharded by band hash. A batch reads only its touched
  *    band shards (partition-pruned), semi-joined to its bounded
  *    touched-band set. Rows carry the doc's minhash signature INLINE:
  *    corpus band rows never shuffle (broadcast probes end to end in
  *    [[Dedup.candidatesCore]]), so the carry costs scan width only,
  *    and verify needs no corpus-wide signature join — every
  *    candidate's signature is already on its touched rows. The trade
  *    is ~bands × sig bytes of state per doc (~8 KB at k=64, b=16);
  *    the alternative — a separate signature table probed per
  *    candidate — costs a second corpus table, a candidate-driven read
  *    per batch, and a shard-collect action mid-plan.
  *
  * Crash/replay contract (the sidecar discipline, applied across two
  * tables): docs append BEFORE bands, and each append is individually
  * idempotent, so EVERY crash point heals on Structured Streaming's
  * batch replay:
  *  - crash before the docs append: replay recomputes the same
  *    survivors (state unchanged) and runs both appends;
  *  - crash between the appends: the replayed batch's already-landed
  *    fingerprints are detected against `__docs` and their band rows
  *    re-derived and appended (`band|fp`-keyed → no-op for rows that
  *    did land) — the heal path every [[ingestBatch]] runs;
  *  - full replay: both appends are no-ops.
  * Near-DROPPED docs leave no state on purpose: an exact resend meets
  * the same near-duplicates and drops again; state converges.
  *
  * Reference analog: the incremental anti-join idiom of
  * `dags/emission-dag.py:204-209` (only new keys land), lifted to
  * content fingerprints and LSH bands.
  */
object DedupState {

  /** Dedup parameters. `sigOf` overrides the signature expression
    * (text column → array<long> of k minhashes) — the production
    * default is the codegen'd [[Dedup.minhashSignature]] over word
    * shingles; oracle twins inject a portable md5 formulation
    * (Carter-Wegman seeds, the cwSeedMins recipe) so the whole state
    * lifecycle hash-checks against DuckDB.
    */
  case class Params(
      shingleWidth: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucket: Int = 200,
      nShards: Int = 64,
      sigOf: Option[Column => Column] = None) {
    private[dedup] def sig(text: Column): Column = sigOf match {
      case Some(f) => f(text)
      case None => Dedup.minhashSignature(wordShingles(text, shingleWidth), k)
    }
  }

  def docsTable(name: String): String = s"${name}__docs"
  def bandsTable(name: String): String = s"${name}__bands"

  /** Key a docs frame for the fp-sharded kernel: `id` = content
    * fingerprint, `cell` = its shard.
    */
  private def keyByFp(df: DataFrame, textCol: String, nShards: Int): DataFrame =
    df.withColumn("id", fingerprintMd5(col(textCol)))
      .withColumn("cell", pmod(xxhash64(col("id")), lit(nShards.toLong)).cast("int"))

  /** One (band, doc) state row per LSH band of each doc, keyed for the
    * idempotent kernel and sharded by band hash.
    */
  /** Band state rows from a keyed frame ALREADY carrying `__sig`
    * (computed once and pinned by the callers — recomputing the
    * signature here would re-shingle the batch per downstream branch).
    */
  private def bandRows(withSig: DataFrame, idCol: String, p: Params): DataFrame =
    withSig
      .select(col(idCol).as("doc_id"), col("id").as("__fp"), col("__sig").as("sig"),
        explode(Dedup.bandKeys(col("__sig"), p.k, p.bands)).as("band"))
      .select(
        pmod(col("band"), lit(p.nShards.toLong)).cast("int").as("cell"),
        concat_ws("|", col("band"), col("__fp")).as("id"),
        col("band"), col("doc_id"), col("sig"))

  /** Initialize state from an ALREADY-DEDUPED corpus (the same
    * precondition `minhashDedupIncremental` documents for its
    * `existing` side): one pass builds both tables.
    */
  def init(
      store: TableStore,
      name: String,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      p: Params = Params()): Unit = {
    val keyed = keyByFp(corpus, textCol, p.nShards)
    store.overwritePartitioned(keyed, docsTable(name), "cell")
    store.overwritePartitioned(
      bandRows(keyed.withColumn("__sig", p.sig(col(textCol))), idCol, p),
      bandsTable(name), "cell")
  }

  /** Build the fingerprint bloom sidecar over `__docs` (and one over
    * `__bands`' row keys) so mostly-novel batches probe blooms
    * executor-side instead of reading corpus fingerprints — the exact
    * reuse of [[IndexStore.buildIdBloom]], health-monitored and grown
    * by the same [[IndexStore.bloomHealthReport]]/
    * [[IndexStore.growCellBlooms]].
    *
    * Size `expectedIdsPerCell` near the CURRENT per-shard doc count,
    * not the eventual one: an oversized bloom costs every probe its
    * full width (the ×20 scale probe measured a 1M-capacity sidecar at
    * ~2× the whole probe's cost on a 100k-doc corpus — 77 MB of bloom
    * scan for 1.5k ids/cell), while an undersized one only drifts fpp
    * up until [[IndexStore.growCellBlooms]] doubles it — amortized,
    * and monitored by [[IndexStore.bloomHealthReport]].
    */
  def enableFpBloom(
      store: TableStore,
      name: String,
      expectedIdsPerCell: Long = 1L << 16,
      fpp: Double = 0.01): Unit = {
    IndexStore.buildIdBloom(store, docsTable(name), expectedIdsPerCell, fpp)
    IndexStore.buildIdBloom(store, bandsTable(name), expectedIdsPerCell, fpp)
    // the band-VALUE bloom: per band shard, "does this band key exist
    // in state at all?" — the near-probe twin of the fingerprint bloom.
    // Bands of novel docs are usually novel, so a mostly-novel batch's
    // touched-band set thins to only maybe-present bands BEFORE the
    // state read; shards holding none skip entirely ([[dropsOf]]).
    IndexStore.buildIdBloom(store, bandsTable(name), expectedIdsPerCell, fpp,
      key = "band")
  }

  /** Exact-novel batch rows: in-batch keep-min-id already applied by
    * the callers; here the shard-pruned/bloom-assisted fingerprint
    * anti-join against `__docs`.
    */
  private def novelOf(store: TableStore, name: String, batchExact: DataFrame): DataFrame = {
    val docsT = docsTable(name)
    if (store.exists(docsT)) IndexStore.newById(store, docsT, batchExact)
    else batchExact
  }

  /** Near-duplicate drops of a PINNED `novelSig` frame (callers
    * localCheckpoint it first — the candidate DAG traverses the
    * incoming side in several branches, and an un-pinned probe subtree
    * would re-run the fingerprint anti-join per branch): banded
    * candidates against `__bands` plus in-batch pairs, verified on
    * estimated Jaccard ≥ threshold — [[Dedup.minhashDedupIncremental]]'s
    * rule exactly. Returns distinct dropped ids as `idCol`.
    */
  private def dropsOf(
      store: TableStore,
      name: String,
      novelSig: DataFrame,
      idCol: String,
      p: Params): DataFrame = {
    val incSigs = novelSig.select(col(idCol).as("id"), col("__sig").as("sig"))
    val bandsT = bandsTable(name)
    val pairs =
      if (!store.exists(bandsT)) {
        // no near state yet: in-batch pairs only (empty corpus
        // membership, schema inherited from the incoming side)
        Dedup.candidatesCore(incSigs,
          _ => incSigs.select(
            struct(col("id"), lit(false).as("is_new")).as("m"),
            col("sig"), lit(0L).as("band"))
            .select(col("band"), col("m"), col("sig")).limit(0),
          p.k, p.bands, p.threshold, p.maxBucket)
      } else {
        Dedup.candidatesCore(incSigs,
          touched => {
            // band-bloom thinning first (no-op without the sidecar),
            // then the maybe-set's shards are driver-known and
            // ≤ nShards: the state read partition-prunes to them, and
            // the bounded maybe set semi-joins map-side
            val maybe = maybeTouchedBands(store, name, touched, p)
            val shards = maybe
              .select(pmod(col("band"), lit(p.nShards.toLong)).cast("int").as("c"))
              .distinct().collect().map(r => String.valueOf(r.getInt(0))).toSeq
            val pruned =
              if (shards.isEmpty) {
                // every touched band is bloom-negative: an ALL-NOVEL
                // batch's plan carries no state scan at all — a
                // schema-only empty frame, not even a limit(0) scan
                // node (which would still list the table's partitions)
                val s = store.read(bandsT)
                s.sparkSession.createDataFrame(
                  s.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  s.schema)
              }
              else store.read(bandsT)
                .filter(col("cell").cast("string").isin(shards: _*))
            pruned
              .join(broadcast(maybe), Seq("band"), "left_semi")
              .select(col("band"),
                struct(col("doc_id").as("id"), lit(false).as("is_new")).as("m"),
                col("sig"))
          },
          p.k, p.bands, p.threshold, p.maxBucket)
      }
    pairs.select(col("id_new").as(idCol)).distinct()
  }

  /** Thin a batch's touched band set to the bands that MIGHT exist in
    * the near state — the band-value bloom probe (identity without the
    * sidecar). Bloom-negative bands are definitely absent (the sidecar
    * updates BEFORE band rows land, so it can only over-approximate),
    * contribute no corpus candidates, and drop out here — BEFORE the
    * state read, so shards holding only novel bands never scan at all:
    * a mostly-novel batch's near probe reads ~nothing, the way the
    * fingerprint bloom makes its exact probe read ~nothing. A false
    * positive just reads a shard and semi-joins to an empty match —
    * the exactness of the result never depends on the bloom.
    */
  private[graft] def maybeTouchedBands(
      store: TableStore, name: String, touched: DataFrame, p: Params): DataFrame = {
    val bandsT = bandsTable(name)
    if (!IndexStore.hasBloom(store, bandsT, key = "band")) return touched
    val withCell = touched.withColumn(
      "cell", pmod(col("band"), lit(p.nShards.toLong)).cast("int"))
    val cells = withCell.select(col("cell").cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq
    // pinned: the maybe set feeds both the shard collect and the
    // broadcast semi-join — tiny (≤ touched bands), so the checkpoint
    // costs nothing and the bloom join runs once
    IndexStore.bloomTagged(store, bandsT, withCell, cells, key = "band")
      .filter(col("__maybe"))
      .select("band")
      .localCheckpoint()
  }

  /** Dedup a batch against the state WITHOUT mutating it: the
    * surviving rows with their original columns. Pure — compose freely.
    */
  def dedupBatch(
      store: TableStore,
      name: String,
      batch: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      p: Params = Params()): DataFrame = {
    requireNoReserved(batch)
    val keyed = keyByFp(batch, textCol, p.nShards)
    val batchExact = graft.ops.RelationalOps
      .dedupKeepFirst(keyed, Seq("id"), Seq(col(idCol)))
    // pin the probe (one fingerprint anti-join, one signature pass) —
    // the candidate DAG fans out over it
    val novelSig = novelOf(store, name, batchExact)
      .withColumn("__sig", p.sig(col(textCol)))
      .localCheckpoint()
    novelSig.join(dropsOf(store, name, novelSig, idCol, p), Seq(idCol), "left_anti")
      .drop("__sig", "id", "cell")
  }

  /** Dedup a micro-batch against the state and fold the survivors in —
    * the `foreachBatch` body. Probes once (persisted), then appends
    * docs, then bands; the bands append also covers the batch's
    * PREVIOUSLY-LANDED fingerprints (the heal path — see the crash
    * contract above). Mutates state; survivors are readable from
    * `<name>__docs`.
    */
  def ingestBatch(
      store: TableStore,
      name: String,
      batch: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      p: Params = Params()): Unit = {
    requireNoReserved(batch)
    val docsT = docsTable(name)
    val keyed = keyByFp(batch, textCol, p.nShards)
    val batchExact = graft.ops.RelationalOps
      .dedupKeepFirst(keyed, Seq("id"), Seq(col(idCol)))
    batchExact.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // localCheckpoint (eager), not persist, for everything whose
      // lineage READS the tables this method is about to MUTATE: a
      // cache eviction between the appends would silently recompute
      // against post-append state (survivors empty, near-dropped docs
      // misread as landed), and the candidate DAG fans out over the
      // probe in several branches — un-pinned, the fingerprint
      // anti-join and signature pass would re-run per branch (the ×20
      // scale probe measured this at ~6× the pinned cost).
      val novel = novelOf(store, name, batchExact).localCheckpoint()
      val novelSig = novel.withColumn("__sig", p.sig(col(textCol)))
        .localCheckpoint()
      val survivors = novelSig
        .join(dropsOf(store, name, novelSig, idCol, p), Seq(idCol), "left_anti")
        .localCheckpoint()
      // docs first: the fingerprint state is what replay consults.
      // Survivors are a pinned newById result — proven fp-novel, so
      // the bloom-preserving no-re-probe append applies (on replay
      // survivors is EMPTY; nothing novel is ever blind-appended).
      val docRows = survivors.drop("__sig")
      if (!store.exists(docsT)) store.overwritePartitioned(docRows, docsT, "cell")
      else IndexStore.appendKnownNewById(store, docsT, docRows)
      // bands second: a novel fingerprint implies novel band|fp keys,
      // so survivors' band rows take the same no-re-probe path; only
      // the batch's already-landed fingerprints (batchExact minus the
      // probe's novel set — the heal of a crash between the appends)
      // go through the probing kernel, and only when present.
      // Survivors reuse their pinned __sig; only heal rows re-sign.
      // The band-VALUE bloom updates before each band append, same
      // over-approximation discipline as the row-key blooms: a crash
      // in between leaves a maybe-present band that reads its shard
      // and matches nothing; the unsafe direction (a landed band the
      // bloom misses → silently missed near-dups) cannot happen.
      val bandsT = bandsTable(name)
      val newRows = bandRows(survivors, idCol, p)
      if (!store.exists(bandsT)) store.overwritePartitioned(newRows, bandsT, "cell")
      else {
        IndexStore.updateIdBloom(store, bandsT, newRows, key = "band")
        IndexStore.appendKnownNewById(store, bandsT, newRows)
      }
      val landedBefore = batchExact.join(
        novel.select(col(idCol)), Seq(idCol), "left_anti")
        .withColumn("__sig", p.sig(col(textCol)))
      if (!landedBefore.isEmpty) {
        val healRows = bandRows(landedBefore, idCol, p)
        IndexStore.updateIdBloom(store, bandsT, healRows, key = "band")
        IndexStore.appendNewById(store, bandsT, healRows)
      }
    } finally batchExact.unpersist()
  }

  /** Collapse the per-batch file accumulation in both state tables —
    * the same crash-safe partition compaction the fact and index
    * tables use; run outside the ingest window. Returns partitions
    * rewritten.
    */
  def compact(
      store: TableStore,
      name: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int =
    Seq(docsTable(name), bandsTable(name))
      .filter(store.exists)
      .map(t => store.compact(t, "cell", targetFileBytes))
      .sum

  private def requireNoReserved(batch: DataFrame): Unit =
    require(!batch.columns.exists(Set("id", "cell", "__sig")),
      "batch must not carry reserved columns id/cell/__sig")
}
