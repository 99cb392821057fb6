package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Document deduplication at training-data scale.
  *
  * Five families, all expressed as declarative DataFrame transforms so
  * Catalyst plans the shuffles and AQE handles skew:
  *
  *  - exact:   hash-groupBy on a content fingerprint — one shuffle on
  *             the fingerprint, map-side partial aggregation.
  *  - MinHash+LSH: shingle → k minhashes → b bands → band-bucket join.
  *             Only documents sharing a band bucket are compared, so
  *             the candidate join is |buckets|-bounded, not O(n²).
  *  - SimHash: 64-bit per-doc signature; near-dups share the signature
  *             (or a band of it) — groupBy, no pairwise compare.
  *  - n-gram Jaccard: exact verify step over candidate pairs only.
  *  - exact substring spans: duplicated n-token runs excised
  *             keep-first (the Lee et al. 2022 shape) — aggregations
  *             only on the gram key, windows only per doc.
  *
  * At 100 TB the only O(n²) danger is a hot band bucket (boilerplate
  * docs); `maxBucket` caps membership per bucket (drop-or-sample), the
  * standard production guard.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct normalized content, with
    * the surviving (minimum) doc id and the duplicate count.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), fingerprintMd5(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dups"))

  /** Exact dedup: keep one row per distinct content (the min-id row). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withFp = docs.withColumn("__fp", fingerprintMd5(col(textCol)))
    graft.ops.RelationalOps
      .dedupKeepFirst(withFp, Seq("__fp"), Seq(col(idCol)))
      .drop("__fp")
  }

  /** MinHash signature: array of k minima of seeded 64-bit hashes over
    * the document's shingle set. Per-row, no shuffle, no UDF — fused
    * native expression (graft.functions.MinHashSig), one compiled
    * double loop per row.
    *
    * (History: a `transform(sequence(1,k), seed -> array_min(...))`
    * HOF formulation re-evaluated the shingling subtree per seed and
    * was ~100× slower; a single-`aggregate` HOF pass fixed that but
    * still paid interpreted lambda dispatch per hash — the native
    * expression removes both.)
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    graft.functions.MinHashFunctions.minhashSig(shingles, k)

  /** LSH band keys: the signature split into `bands` bands of
    * `k/bands` rows, each band hashed to one 64-bit bucket key.
    */
  def bandKeys(sig: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",", transform(slice(sig, b * r + 1, lit(r)), _.cast("string"))), b))
  }

  /** In-bucket member pairs from banded membership rows
    * (`band`, `m` = struct of member payload): groupBy the bucket
    * key, collect members, drop singleton and over-`maxBucket`
    * buckets (skew guard: the pair expansion of a bucket is quadratic
    * in its size — degenerate boilerplate buckets would dominate the
    * output), then explode the in-bucket combinations. ONE shuffle
    * total — cheaper than the window-cap + bucket self-join
    * formulation, which shuffled the membership rows twice more.
    *
    * Returns (`a`, `b`) struct pairs, NOT ordered or deduplicated —
    * callers order by id, apply their verify metric, and `distinct`.
    * Carrying the signature inside `m` multiplies the shuffle payload
    * by `bands`, but buys verify-with-zero-joins: the alternative
    * (ship (id, band) only, re-join signatures per unique pair) costs
    * two more shuffle joins and a second scan of the corpus — the
    * right trade only when signatures are enormous.
    */
  private def bucketMemberPairs(member: DataFrame, maxBucket: Int): DataFrame = {
    // Hot buckets are dropped BEFORE the collect: a size filter after
    // collect_list would still materialize the degenerate bucket's
    // full member array in one aggregation buffer (unbounded on
    // boilerplate-heavy corpora). The count pre-pass is cheap —
    // map-side partial aggregation reduces it to distinct bands per
    // partition — and AQE turns the (typically tiny) hot-band side
    // into a broadcast anti-join at runtime.
    val hot = member.groupBy("band")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .select("band")
    member
      .join(hot, Seq("band"), "left_anti")
      .groupBy("band")
      .agg(collect_list(col("m")).as("ms"))
      .filter(size(col("ms")) >= 2)
      .select(posexplode(col("ms")).as(Seq("i", "a")), col("ms"))
      .select(col("a"), explode(slice(col("ms"), col("i") + lit(2), size(col("ms")))).as("b"))
  }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with the
    * estimated Jaccard (fraction of agreeing minhashes) — returns
    * (id_a, id_b, est_jaccard) with id_a < id_b, est >= `threshold`.
    *
    * Plan shape: project(shingle+sig+bands) → explode(bands) →
    * groupBy band → explode bounded in-bucket ID pairs → distinct →
    * re-attach signatures per UNIQUE pair → codegen'd agree-count.
    *
    * Membership rows and pair rows carry IDS ONLY. With a k-long
    * signature (512 B) the sig-carry variant (inline verify, no
    * joins) multiplies the band shuffle AND the pre-distinct pair
    * rows by the signature width — measured 10× slower at a ×20
    * duplicate-heavy probe, since an exact-dup pair collides in all
    * `bands` buckets and each collision row would haul 1 KB of sigs
    * into the distinct. SimHash (8 B sig) takes the opposite trade —
    * see simhashNearDupPairs. Signatures here are recomputed by the
    * two re-attach joins rather than persisted: the single-base-hash
    * MinHashSig makes signature computation scan-cheap, and keeping
    * the operator lazy/cache-free composes better than implicit
    * persist side effects.
    */
  def minhashCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleWidth: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 200): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("id"),
      minhashSignature(wordShingles(col(textCol), shingleWidth), k).as("sig"))
    val member = sigs.select(
      col("id").as("m"),
      explode(bandKeys(col("sig"), k, bands)).as("band"))
    val pairs = bucketMemberPairs(member, maxBucket)
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"))
      .distinct()
    val agree = graft.functions.VectorFunctions
      .longArrayAgree(col("sig_a"), col("sig_b"))
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / lit(k.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Candidate near-duplicate pairs BETWEEN a (small) incoming batch
    * and a (huge) existing corpus, plus pairs within the batch — the
    * incremental-ingestion shape. The asymmetry is the scale lever,
    * and the CORPUS SIDE NEVER SHUFFLES: pairs come from a broadcast
    * hash join of the (bounded) incoming membership against the
    * corpus membership stream, so every formed pair has an incoming
    * member by construction (no corpus×corpus combinations ever
    * exist), and buckets the batch does not touch are pruned map-side
    * by a broadcast semi-join before that.
    *
    * Hot buckets (boilerplate-heavy band keys) are handled by
    * SAMPLING, not dropping: a bucket whose membership exceeds
    * `maxBucket` on the corpus side — or on the incoming BUILD side of
    * the pair join — keeps a deterministic ~maxBucket-member hash
    * sample, so a doc whose only collisions fall in hot buckets is
    * still compared against representatives of them rather than
    * silently bypassing near-dedup (boilerplate members are near-dups
    * of each other, so representatives carry the signal). The PROBE
    * side keeps every incoming member — each incoming doc always
    * pairs against its bucket's representatives — so the per-bucket
    * join fan-out is ≤ |bucket members| · maxBucket even for a
    * boilerplate-heavy batch (the old whole-bucket drop was bounded
    * too, but silently skipped those docs entirely).
    *
    * Ids must be distinct across the two inputs (they share the id
    * space in the output). Returns (id_new, id_other, est_jaccard,
    * other_is_new): `id_new` is always from `incoming`; when both
    * sides are incoming the pair appears once with id_new > id_other.
    */
  def minhashCandidatesAgainst(
      incoming: DataFrame,
      existing: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleWidth: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 200): DataFrame = {
    def sigs(df: DataFrame) = df.select(
      col(idCol).as("id"),
      minhashSignature(wordShingles(col(textCol), shingleWidth), k).as("sig"))
    val exSigs = sigs(existing)
    candidatesCore(
      sigs(incoming),
      // the batch's bucket keys are bounded → broadcast semi-join
      // prunes the corpus membership map-side
      touched => exSigs.select(
        struct(col("id"), lit(false).as("is_new")).as("m"), col("sig"),
        explode(bandKeys(col("sig"), k, bands)).as("band"))
        .join(broadcast(touched), Seq("band"), "left_semi"),
      k, bands, threshold, maxBucket)
  }

  /** The asymmetric candidate kernel behind [[minhashCandidatesAgainst]]
    * and [[DedupState]]: incoming signatures vs a caller-supplied
    * corpus MEMBERSHIP source. `exMemberOf` maps the batch's touched
    * band set (bounded — broadcast it) to the corpus rows of those
    * bands as (band, m = struct(id, is_new=false), sig); the text path
    * explodes recomputed signatures, the state path reads its sharded
    * band table. Corpus member rows never shuffle (broadcast probes end
    * to end), so carrying the signature inline costs scan width only —
    * and buys verify without any corpus-wide signature join: every
    * candidate's signature is already on its (capped) touched rows.
    * Pair rows still carry IDS ONLY through the distinct.
    */
  private[graft] def candidatesCore(
      incSigs: DataFrame,
      exMemberOf: DataFrame => DataFrame,
      k: Int,
      bands: Int,
      threshold: Double,
      maxBucket: Int): DataFrame = {
    val incMember = incSigs.select(
      struct(col("id"), lit(true).as("is_new")).as("m"), col("sig"),
      explode(bandKeys(col("sig"), k, bands)).as("band"))
    val touched = incMember.select("band").distinct()
    val exMember = exMemberOf(touched)
    // per-touched-bucket counts are ≤ |batch|·bands rows →
    // broadcastable; hot buckets thin to a ~maxBucket hash sample
    // (deterministic in the data, no sort, no per-bucket materialization)
    def capHot(member: DataFrame): DataFrame = {
      val hotCounts = member.groupBy("band")
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket)
      member
        .join(broadcast(hotCounts), Seq("band"), "left")
        .filter(col("__n").isNull ||
          pmod(xxhash64(col("band"), col("m.id")), lit(1000000L)) * col("__n")
            < lit(maxBucket.toLong * 1000000L))
        .drop("__n")
    }
    val exCapped = capHot(exMember)
    // broadcast-join pair formation: the (capped) incoming side is the
    // build side, the full membership streams as the probe — every
    // pair has ≥1 incoming member, and a boilerplate-heavy batch
    // cannot blow the per-bucket fan-out past members·maxBucket
    val allMember = incMember.unionByName(exCapped)
    val pairs = allMember.select(col("m").as("b"), col("band"))
      .join(broadcast(capHot(incMember).select(col("m").as("a"), col("band"))), Seq("band"))
      .filter(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ida"), col("a.is_new").as("na"),
        col("b.id").as("idb"), col("b.is_new").as("nb"))
      .select(
        when(col("na") && col("nb"), greatest(col("ida"), col("idb")))
          .when(col("na"), col("ida")).otherwise(col("idb")).as("id_new"),
        when(col("na") && col("nb"), least(col("ida"), col("idb")))
          .when(col("na"), col("idb")).otherwise(col("ida")).as("id_other"),
        (col("na") && col("nb")).as("other_is_new"))
      .filter(col("id_new") =!= col("id_other"))
      .distinct()
    // signature re-attach per unique pair: batch sigs plus the capped
    // touched corpus rows' sigs — id_other only ever names one of those
    val allSigs = incSigs.unionByName(
      exCapped.select(col("m.id").as("id"), col("sig")).dropDuplicates("id"))
    val agree = graft.functions.VectorFunctions
      .longArrayAgree(col("sig_a"), col("sig_b"))
    pairs
      .join(allSigs.select(col("id").as("id_new"), col("sig").as("sig_a")), Seq("id_new"))
      .join(allSigs.select(col("id").as("id_other"), col("sig").as("sig_b")), Seq("id_other"))
      .select(col("id_new"), col("id_other"),
        (agree.cast("double") / lit(k.toDouble)).as("est_jaccard"),
        col("other_is_new"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Incremental dedup of a batch against an existing (already-deduped)
    * corpus: an incoming doc survives unless it is an exact or
    * near-duplicate of ANY existing doc (regardless of id order), or
    * of a SMALLER-id doc within its own batch (the same one-hop rule
    * as [[minhashDedup]]). Exact dups are dropped by fingerprint
    * first — cheap, and independent of the near path's hot-bucket
    * sampling — then the asymmetric candidate pass handles near-dups.
    * Returns the surviving incoming rows.
    */
  def minhashDedupIncremental(
      incoming: DataFrame,
      existing: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8): DataFrame = {
    // exact: drop fingerprints the corpus already holds; keep min id per
    // fingerprint within the batch
    val exFps = existing.select(fingerprintMd5(col(textCol)).as("__fp")).distinct()
    val fresh = incoming
      .withColumn("__fp", fingerprintMd5(col(textCol)))
      .join(exFps, Seq("__fp"), "left_anti")
    val batchExact = graft.ops.RelationalOps
      .dedupKeepFirst(fresh, Seq("__fp"), Seq(col(idCol)))
      .drop("__fp")
    // near: any surviving incoming doc paired with an existing doc or a
    // smaller batch doc goes
    val drops = minhashCandidatesAgainst(
      batchExact, existing, idCol, textCol, threshold = threshold)
      .select(col("id_new").as(idCol)).distinct()
    batchExact.join(drops, Seq(idCol), "left_anti")
  }

  /** MinHash-LSH dedup: drop every doc that is near-duplicate of a
    * lower-id doc (single-link, one hop — the standard approximation
    * that avoids a distributed union-find; iterate to converge if the
    * duplicate graph has long chains).
    */
  def minhashDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8): DataFrame = {
    val dupIds = minhashCandidates(docs, idCol, textCol, threshold = threshold)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Connected-component near-dup dedup — the fixpoint variant of
    * [[minhashDedup]] for duplicate graphs with chains. One-hop keeps
    * any doc that is only ever the LOWER id of its candidate pairs
    * even when it is transitively linked to a smaller doc (ids 1,2,3
    * with edges (1,3),(2,3): one-hop drops only 3; the component rule
    * keeps exactly the min id, 1). Here: one LSH candidate pass, then
    * iterative min-label propagation over the candidate graph until no
    * label changes (or `maxIters`) — each doc ends labeled with the
    * smallest id reachable through near-dup edges, and every non-label
    * doc is dropped.
    *
    * Scale shape: the edge set is the (bounded) LSH candidate output,
    * localCheckpoint'd once so each of the O(diameter) iterations is a
    * join + min-groupBy over (node,label) pairs — no re-run of the LSH
    * pass, no lineage growth. Duplicate-graph diameters are tiny in
    * practice (dup clusters are dense); `maxIters` bounds the
    * pathological chain. On a real cluster swap localCheckpoint for
    * reliable checkpointing; the alternating large-star/small-star
    * formulation (Kiveris et al., "Connected Components in MapReduce")
    * is the drop-in upgrade if diameters ever matter.
    */
  def minhashDedupFixpoint(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      maxIters: Int = 20,
      shingleWidth: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      maxBucket: Int = 200): DataFrame =
    componentDedup(
      docs,
      minhashCandidates(docs, idCol, textCol, shingleWidth, k, bands, threshold, maxBucket),
      idCol, maxIters)

  /** Drop every doc that is NOT the minimum id of its connected
    * component in the candidate-pair graph (`pairs`: id_a, id_b).
    * Min-label propagation to fixpoint; see [[minhashDedupFixpoint]]
    * for the scale discussion. Exposed separately so any candidate
    * generator (MinHash, SimHash, embedding-cosine) composes with the
    * same component rule — and so the component logic itself is
    * oracle-checkable against a recursive-CTE second engine on
    * portable-hash pairs.
    */
  def componentDedup(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxIters: Int = 20): DataFrame = {
    val p = pairs.select(col("id_a"), col("id_b"))
    val edges = p
      .union(p.select(col("id_b"), col("id_a")))
      .toDF("node", "nbr")
      .localCheckpoint()
    // init folds the first propagation in: label0 = min(node, min nbr).
    // Dup clusters are usually cliques, which converge right here —
    // the loop then runs a single confirming iteration.
    var labels = edges.groupBy("node")
      .agg(least(col("node"), min(col("nbr"))).as("label"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("node").as("nbr"), col("label").as("nbr_label")), Seq("nbr"))
        .groupBy("node")
        .agg(min(col("nbr_label")).as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (col("nbr_min") < col("label")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select("node", "label")
      iter += 1
    }
    // Exiting with labels still moving means some nodes have not reached
    // their component minimum — silent use would drop the wrong docs.
    // Label propagation is O(diameter): a long duplicate chain can
    // legitimately exceed maxIters; the error names the O(log n)
    // alternative rather than returning wrong output.
    if (changed > 0)
      throw new IllegalStateException(
        s"componentDedup did not converge in $maxIters rounds ($changed labels " +
          s"still moving) — raise maxIters or use componentDedupStar (O(log n) rounds)")
    val drops = labels.filter(col("label") =!= col("node")).select(col("node").as(idCol))
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** [[componentDedup]] on the alternating large-star/small-star
    * formulation (Kiveris et al., "Connected Components in MapReduce
    * and Beyond") — the opt-in for duplicate graphs with LONG CHAINS,
    * where min-label propagation's O(diameter) rounds is the
    * bottleneck. Each round rewires the graph toward its component
    * minima:
    *
    *  - large-star: every node connects its LARGER neighbors to the
    *    minimum of its neighborhood (including itself);
    *  - small-star: every node connects its smaller-or-equal
    *    neighbors (and itself) to that minimum.
    *
    * Each is one bidirectional-edge groupBy + join — the same shuffle
    * cost per round as a label-propagation round — but the graph
    * contracts toward star forests in O(log n) rounds regardless of
    * diameter (a 64-node path converges in ~6 rounds vs ~63). At
    * convergence every edge points a non-minimum node directly at its
    * component minimum, so the drop set is just the distinct left
    * endpoints. Convergence is detected by an order-independent edge
    * signature (count + hash sum — one tiny action per round);
    * `maxIters` bounds the pathological case.
    *
    * Dense dup clusters (the common corpus shape) converge in 1-2
    * rounds under BOTH algorithms — but measured on a 100k ×20-dup
    * corpus the star alternation ran ~4× faster even there (16.8 s vs
    * 73.8 s: fewer and cheaper rounds), and it is the only
    * O(log n)-bounded choice when chain-shaped duplicate graphs
    * (rolling boilerplate, near-identical page series) can appear.
    * [[componentDedup]] remains the simpler plan to read and the one
    * the DuckDB closure oracle checks directly; both are oracle-pinned
    * to identical output.
    */
  def componentDedupStar(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxIters: Int = 20): DataFrame = {
    val drops = componentLabels(pairs, maxIters)
      .filter(col("label") =!= col("node"))
      .select(col("node").as(idCol))
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** Connected-component label for every node of the candidate-pair
    * graph: (node, label) where label = the component's minimum id —
    * the observability companion of the dedup drops (cluster sizes,
    * representative selection, per-cluster stats all group on the
    * label). Same large-star/small-star machinery and guarantees as
    * [[componentDedupStar]]; nodes with no edges are not in the graph
    * and so not in the output (they are their own singleton clusters).
    */
  def componentLabels(
      pairs: DataFrame,
      maxIters: Int = 20): DataFrame = {
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    // order-independent edge-set signature; XOR fold (not sum) so the
    // 64-bit hashes never overflow under ANSI arithmetic
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(edges)
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIters) {
      // large-star: (nbr, m) for every nbr > node, m = min(N(node) ∪ {node})
      val nbrs = edges.select(col("u").as("node"), col("v").as("nbr"))
        .union(edges.select(col("v").as("node"), col("u").as("nbr")))
      val minByNode = nbrs.groupBy("node")
        .agg(least(col("node"), min(col("nbr"))).as("m"))
      val ls = nbrs.join(minByNode, "node")
        .filter(col("nbr") > col("node"))
        .select(col("nbr").as("u"), col("m").as("v"))
        .distinct()
      // small-star over hi→lo edges: node u's smaller neighbors (and u)
      // all attach to m = min of them — (v, m) keeps the hi→lo invariant
      val minByU = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(minByU, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(minByU.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()
      val nsig = signature(ss)
      converged = nsig == sig
      sig = nsig
      edges = ss
      iter += 1
    }
    // A non-fixpoint edge set yields plausible-but-WRONG labels (nodes
    // not yet pointing at their component minimum), and downstream dedup
    // would keep/drop the wrong docs with no signal — abort instead.
    // The alternation contracts in O(log n) rounds, so hitting this
    // means maxIters was set far below log2(|nodes|).
    if (!converged)
      throw new IllegalStateException(
        s"componentLabels did not converge in $maxIters rounds; " +
          s"labels would be incorrect — raise maxIters (O(log n) rounds suffice)")
    // star forest: every non-minimum node points straight at its
    // component minimum; the minima label themselves
    val nonRoots = edges.select(col("u").as("node"), col("v").as("label")).distinct()
    val roots = edges.select(col("v").as("node")).distinct()
      .join(nonRoots.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("label"))
    nonRoots.unionByName(roots)
  }

  /** Canonical-document selection: one surviving row per connected
    * component of the candidate graph, chosen by `scoreExpr` (highest
    * wins; ties to the smallest id) instead of [[componentDedup]]'s
    * min-id rule — "keep the BEST copy of each near-dup cluster, not
    * the first-crawled one", the curation-quality upgrade of component
    * dedup. Docs with no edges are their own singleton clusters and
    * always survive. Same O(log n) large-star/small-star labeling,
    * then one bounded per-cluster top-1 window; adds a `cluster`
    * column (the component's min id) to the surviving rows.
    */
  def componentRepresentatives(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      scoreExpr: Column,
      maxIters: Int = 20): DataFrame = {
    val labels = componentLabels(pairs, maxIters)
      .withColumnsRenamed(Map("node" -> idCol, "label" -> "__label"))
    val labeled = docs
      .join(labels, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("__label"), col(idCol)))
      .drop("__label")
    graft.ops.RelationalOps
      .topKPerGroup(labeled, Seq("cluster"), Seq(scoreExpr.desc, col(idCol).asc), 1)
      .drop("rn")
  }

  /** 64-bit SimHash over the token multiset as a LONG: bit b is the
    * sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1). Fused
    * native expression (graft.functions.SimHash64) — one hash per
    * token, one compiled pass, no shuffle, no UDF; downstream band
    * extraction and Hamming distance stay in codegen as bit ops.
    */
  def simhash(text: Column): Column =
    graft.functions.SimHashFunctions.simhash64(tokens(text))

  /** Banded SimHash near-dup candidate pairs: the 64-bit signature
    * splits into 4 × 16-bit bands; docs sharing any band become a
    * candidate pair (the pigeonhole guarantee: Hamming distance ≤ 3
    * ⇒ at least one identical band); exact Hamming distance
    * (`bit_count(a ^ b)`, pure codegen) filters to `maxHamming`.
    * Same light-pairs/skew-cap shape as MinHash LSH. Band key packs
    * (band index, 16 signature bits) into one long — no strings.
    */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    simhashBandedPairs(
      docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig")),
      sigBits = 64, nBands = 4, maxHamming = maxHamming, maxBucket = maxBucket)

  /** The band/pair/Hamming stage of [[simhashNearDupPairs]] over an
    * arbitrary pre-computed signature frame (`id`, `sig` LONG holding
    * `sigBits` significant bits): the signature splits into `nBands`
    * equal bands, docs sharing any band become a candidate pair, exact
    * Hamming distance filters to `maxHamming`. Pigeonhole: distance
    * ≤ nBands-1 GUARANTEES a shared band, so for maxHamming < nBands
    * the output is exactly the all-pairs Hamming ball — which is what
    * lets the md5-twin query (q_dedup_simhash_pairs_md5) pin this
    * exact code path against a closed-form second-engine oracle while
    * the production 64-bit path keeps its native xxhash signature.
    */
  def simhashBandedPairs(
      sigs: DataFrame,
      sigBits: Int,
      nBands: Int,
      maxHamming: Int,
      maxBucket: Int): DataFrame = {
    require(sigBits % nBands == 0, s"sigBits $sigBits not divisible into $nBands bands")
    val bandBits = sigBits / nBands
    val mask = (1L << bandBits) - 1
    val member = sigs.select(
      struct(col("id"), col("sig")).as("m"),
      explode(array((0 until nBands).map(b =>
        shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask))
          + lit(b.toLong * (mask + 1))): _*))
        .as("band"))
    val lo = when(col("a.id") < col("b.id"), col("a")).otherwise(col("b"))
    val hi = when(col("a.id") < col("b.id"), col("b")).otherwise(col("a"))
    bucketMemberPairs(member, maxBucket)
      .select(lo.as("pa"), hi.as("pb"))
      .distinct() // collapse multi-band collisions before the compare
      .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"),
        bit_count(col("pa.sig").bitwiseXOR(col("pb.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-dup groups: docs whose signatures agree on a 16-bit
    * band for all 4 bands would be identical; here we group by the full
    * signature for exact-simhash dup detection and return group sizes.
    */
  def simhashGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), simhash(col(textCol)).as("simhash"))
      .groupBy("simhash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("members"))

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (id_a, id_b) — the verify stage after LSH. Joins the shingle sets
    * back and computes |∩| / |∪| with array functions.
    */
  def ngramJaccard(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(charShingles(col(textCol), n)).as("sh"))
    pairs
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
  }

  /** Span-level exact substring dedup — the fifth family, the Lee et
    * al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better") shape re-expressed relationally: any `n`-token gram
    * occurring at ≥ 2 (doc, pos) sites corpus-wide marks every
    * occurrence EXCEPT the globally first (min doc id, then min
    * position within it) for removal; overlapping or adjacent marked
    * grams merge into spans [start_tok, end_tok).
    *
    * Scale shape: the gram stream shuffles once on the gram key and
    * reduces through AGGREGATIONS only — count + a two-stage
    * first-occurrence min (min doc per gram, then min pos within that
    * doc) — so a boilerplate gram occurring 10⁸ times costs a
    * map-side-combined counter, never a single-task per-gram sort
    * (the same hot-key discipline as the LSH bucket cap). The only
    * window partitions by DOC for the span merge — bounded by doc
    * length. A suffix array finds duplicated spans of ANY length in
    * O(total); fixed-n gram matching is the standard relational
    * approximation — duplicated runs ≥ n tokens are found exactly
    * (as merged runs of overlapping duplicated grams), shorter ones
    * not at all.
    *
    * `hashGrams` (the production default) keys the shuffle on
    * xxhash64(gram) — 8 bytes instead of the ~n·wordlen gram string,
    * an ~8× lighter shuffle since the gram stream is one row per
    * corpus token position. A 64-bit collision can mark a
    * non-duplicate span (lost text, never corruption) at ~|grams|²/2⁶⁴
    * odds; the string mode is the engine-portable twin the DuckDB
    * oracle checks, and the spec pins hashed ≡ string on the test
    * corpus.
    */
  def duplicateSpans(
      docs: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashGrams: Boolean = true): DataFrame =
    duplicateSpansKeyed(docs, n, idCol, textCol,
      if (hashGrams) (g: Column) => xxhash64(g) else (g: Column) => g)

  /** [[duplicateSpans]] with a caller-supplied gram→shuffle-key
    * transform — the twin hook that lets an engine-portable digest
    * (md5 halves, the cwSeedMins recipe) stand in for xxhash64 so the
    * HASHED production shuffle shape is oracle-checkable, not only
    * spec-pinned against the string mode.
    */
  private[graft] def duplicateSpansKeyed(
      docs: DataFrame,
      n: Int,
      idCol: String,
      textCol: String,
      keyOf: Column => Column): DataFrame = {
    require(n >= 2, s"span gram width must be >= 2, got $n")
    val gramStr = (i: Column) => array_join(slice(col("toks"), i + 1, lit(n)), " ")
    val gramExpr = (i: Column) => keyOf(gramStr(i))
    val grams = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - n),
        i => gramExpr(i))).as(Seq("pos", "gram")))
    val byGram = grams.groupBy("gram")
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("fid"))
      .filter(col("cnt") >= 2)
      .select("gram", "fid")
    val firstPos = grams.join(byGram, Seq("gram"))
      .filter(col("id") === col("fid"))
      .groupBy("gram").agg(min(col("pos")).as("fpos"))
    val removals = grams
      .join(byGram, Seq("gram"))
      .join(firstPos, Seq("gram"))
      .filter(!(col("id") === col("fid") && col("pos") === col("fpos")))
      .select(col("id"), col("pos").as("start"), (col("pos") + n).as("end"))
    // gaps-and-islands merge of [start, end) ranges, windowed per doc
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("start")
    val runMax = max(col("end"))
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val islands = removals
      .withColumn("ns", when(runMax.isNull || col("start") > runMax, 1).otherwise(0))
      .withColumn("sid", sum(col("ns"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    islands.groupBy(col("id"), col("sid"))
      .agg(min(col("start")).as("start_tok"), max(col("end")).as("end_tok"))
      .select(col("id").as(idCol), col("start_tok"), col("end_tok"))
  }

  /** [[duplicateSpans]] applied: every marked token range is excised
    * and the survivors re-join (single-space, lowercase-normalized —
    * the same token stream the spans were computed over). Docs shorter
    * than `n` tokens or without duplicated spans pass through
    * normalized. The excision is a range anti-join of the token
    * stream against the span set ON THE `doc_id` EQUI-KEY — the span
    * set is corpus-proportional (Lee et al. 2022 report ~3% of
    * tokens sit in duplicated spans, so at 100 TB it is itself
    * multi-TB), which is why there is deliberately NO broadcast hint
    * here: Catalyst shuffle-joins both sides on the id key and
    * evaluates the positional range as a residual predicate, and AQE
    * still picks a broadcast at runtime when the span set really is
    * small. Then a per-doc ordered re-assembly — no text ever moves
    * through a window.
    */
  def removeDuplicateSpans(
      docs: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashGrams: Boolean = true): DataFrame = {
    val spans = duplicateSpans(docs, n, idCol, textCol, hashGrams)
      .select(col(idCol).as("__sid"), col("start_tok"), col("end_tok"))
    val toksPos = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val kept = toksPos.join(spans,
      col(idCol) === col("__sid") &&
        col("pos") >= col("start_tok") && col("pos") < col("end_tok"),
      "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        e => e("tok")), " ").as("clean_text"))
    // empty docs (or docs whose every token was excised) survive as ''
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // ---------------------------------------------- multi-scale dup runs

  /** Longest duplicated run starting at each token position, to ×2
    * resolution — the suffix-array-TIGHTENING refinement of
    * [[duplicateSpans]]. Fixed-n detection answers "is this position
    * inside a duplicated run ≥ n tokens?"; this answers "HOW LONG is
    * the duplicated run starting here?" at power-of-two widths
    * n·2^k, k < `levels` — the curation signal that separates 8-token
    * boilerplate from wholesale copying (memorization risk grows with
    * run length — Lee et al. 2022 §6).
    *
    * The suffix-array idea (every repeated substring is a shared
    * suffix prefix) is realized relationally by PREFIX DOUBLING,
    * Manber & Myers 1990's trick: a signature for the 2w-token window
    * at `pos` is the combine of the two w-token signatures at `pos`
    * and `pos+w`, so every level above the first costs O(1) per
    * position and is computed DOC-LOCALLY (array transforms — no
    * join, no shuffle, no re-reading 2^k tokens). A window of width
    * n·2^k is duplicated iff its signature occurs at ≥ 2 (doc, pos)
    * sites corpus-wide; dup levels per position are downward-closed
    * (a duplicated 2w-window's w-prefix is duplicated too), so the
    * max dup level IS the run length to ×2 resolution.
    *
    * Shuffle shape: ALL levels explode into one (level, sig) stream —
    * ≤ `levels`·|tokens| rows, 8-byte sigs in production — reduced by
    * ONE count aggregation (map-side combined; a boilerplate window
    * occurring 10⁸ times costs a counter, never a sort) and joined
    * back on the same key. The duplicated-key set is
    * corpus-proportional, so there is deliberately NO broadcast hint
    * (the r6 span-excision lesson); AQE may still pick one when it
    * really is small.
    *
    * Output: one row per position whose base (width-n) window is
    * duplicated: (`idCol`, pos, run_len) with run_len = n·2^(max dup
    * level). A true duplicated run of L tokens starting at `pos`
    * makes every n·2^k ≤ L window at `pos` duplicated (a prefix of a
    * duplicated run is duplicated), so run_len = n·2^⌊log₂(L/n)⌋ —
    * always within 2× of L when `levels` reaches the doc length.
    *
    * `hashGrams` (production default) signs windows with xxhash64 and
    * doubles on the 8-byte values; `false` keeps literal substrings
    * (doubling-concat of substrings ≡ the wide substring), the
    * engine-portable twin the DuckDB oracle replays — DedupSpec pins
    * hashed ≡ string on the test corpus. A 64-bit collision can
    * overstate one run's length (never corrupt text); odds are
    * ~|windows|²/2⁶⁴ as with [[duplicateSpans]].
    */
  def dupRuns(
      docs: DataFrame,
      n: Int,
      levels: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashGrams: Boolean = true): DataFrame = {
    require(n >= 2, s"base window width must be >= 2, got $n")
    require(levels >= 1 && levels <= 16, s"levels must be in [1,16], got $levels")
    val sigT = if (hashGrams) "bigint" else "string"
    val emptySigs = expr(s"CAST(array() AS array<$sigT>)")
    val base = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
    // level-0 signatures: one per window start, the same gram pass as
    // duplicateSpans (array_join inside the transform is the O(n) base
    // cost; every higher level is O(1) per position)
    val gram0 = (i: Column) => array_join(slice(col("toks"), i + 1, lit(n)), " ")
    val sig0 = (i: Column) => if (hashGrams) xxhash64(gram0(i)) else gram0(i)
    val withSigs = (1 until levels).foldLeft(
      base.withColumn("sig0", transform(
        sequence(lit(0), size(col("toks")) - n), i => sig0(i)))) { (df, k) =>
      // width doubles: combine the two half-window signatures
      val step = n * (1 << (k - 1))
      val prev = col(s"sig${k - 1}")
      val combine = (i: Column) =>
        if (hashGrams) xxhash64(element_at(prev, i + 1), element_at(prev, i + step + 1))
        else concat(element_at(prev, i + 1), lit(" "), element_at(prev, i + step + 1))
      // width at level k is 2·step tokens; valid starts 0..len-2·step
      df.withColumn(s"sig$k",
        when(size(col("toks")) >= 2 * step, transform(
          sequence(lit(0), size(col("toks")) - 2 * step), i => combine(i)))
          .otherwise(emptySigs))
    }
    // one explode for all levels: flatten per-doc (level, pos, sig)
    val leveled = flatten(array((0 until levels).map { k =>
      transform(col(s"sig$k"), (s, i) =>
        struct(lit(k).as("lvl"), i.cast("int").as("pos"), s.as("sig")))
    }: _*))
    // the (lvl, sig)-keyed repartition pins ONE exchange read by both
    // consumers (the dup-count aggregate and the join-back) via
    // ReusedExchange — without it the interpreted doc-local signature
    // pipeline (HOFs are CodegenFallback) runs twice end to end.
    // Map-side combine is traded away, but the signature compute
    // dominates it at every measured scale (×20 probe: 191→~60 s).
    val posSigs = withSigs
      .select(col("id"), explode(leveled).as("e"))
      .select(col("id"), col("e.lvl").as("lvl"), col("e.pos").as("pos"), col("e.sig").as("sig"))
      .repartition(col("lvl"), col("sig"))
    val dupKeys = posSigs.groupBy("lvl", "sig")
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2)
      .select("lvl", "sig")
    posSigs.join(dupKeys, Seq("lvl", "sig"))
      .groupBy(col("id"), col("pos"))
      .agg(max(expr(s"$n * shiftleft(1, lvl)")).cast("int").as("run_len"))
      .select(col("id").as(idCol), col("pos"), col("run_len"))
  }

  /** Per-doc rollup of [[dupRuns]]: how much of the doc starts
    * duplicated runs and how long the longest one is —
    * (`idCol`, n_dup_pos, max_run). Docs with no duplicated base
    * window emit no row.
    */
  def dupRunStats(
      docs: DataFrame,
      n: Int,
      levels: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashGrams: Boolean = true): DataFrame =
    dupRuns(docs, n, levels, idCol, textCol, hashGrams)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_pos"), max(col("run_len")).as("max_run"))
}
