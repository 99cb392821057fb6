package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline: query ⨯ corpus
  *    join, per-pair dot product via `zip_with`/`aggregate` (no UDF),
  *    `row_number` top-k. O(|Q|·|C|); correct at any scale if |Q| is
  *    bounded, and the corpus side streams (no materialized cross
  *    product — Spark pipelines the BroadcastNestedLoopJoin when the
  *    query side is broadcast).
  *  - LSH-bucketed (random hyperplanes): each vector hashes to a
  *    sign-pattern bucket per table; candidates share a bucket in at
  *    least one table — turns the cross join into a bucket-keyed
  *    equi-join (shuffle on bucket id), the 100 TB scale path. Recall
  *    is tunable via (nTables, nBits).
  */
object Ann {

  /** Dot product of two equal-length float-array columns (as double) —
    * fused native Catalyst expression (codegen'd single loop; see
    * graft.functions.FloatVecDot).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** Reference HOF formulation — interpreted; kept for cross-checking
    * the native expression (bitwise-identical accumulation order).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine from a single dot product and PRE-PROJECTED norms —
    * bit-identical to [[cosine]] (`normA`/`normB` are the same
    * `l2Norm` values, just computed once per side instead of three
    * dot products per candidate pair; ~3× fewer flops on the pair
    * hot loop, the most expensive part of every ANN plan).
    */
  def cosinePreNormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact top-k cosine neighbors for every vector in `queries`
    * against `corpus` (self-matches excluded). Deterministic
    * tie-break on neighbor id.
    *
    * Reduction shape: the |Q|·|C| scored stream never shuffles —
    * [[RelationalOps.topKPerGroupPartial]] reduces each partition to a
    * k-heap per query map-side, so the wire carries |Q|·k·partitions
    * entries regardless of corpus size (the raw `row_number` window
    * would move — and single-task sort — each query's entire
    * corpus-worth of candidates).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        l2Norm(col(vecCol)).as("q_norm")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"))
    val scored = c
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosinePreNormed(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
          .as("cos"))
    RelationalOps
      .topKPerGroupPartial(
        scored, Seq("query_id"),
        score = col("cos"), id = col("neighbor_id"),
        k = k, scoreAscending = false,
        idName = "neighbor_id", scoreName = "cos")
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** LSH-bucketed approximate top-k: vectors are assigned to
    * `nTables` buckets; candidate pairs co-occur in ≥1 bucket; exact
    * cosine is computed only for unique candidate pairs. Same output
    * schema as [[bruteForceTopK]]; recall < 1 by design.
    *
    * Scale discipline (learned from a 40k-vector probe that produced
    * an ~80 GB shuffle from the naive formulation):
    *  - the bucket self-join carries ONLY (id, bucket) rows; vectors
    *    re-attach per unique pair afterwards;
    *  - `maxBucket` drops degenerate buckets before the join — the
    *    pair expansion of a bucket is quadratic in its size;
    *  - size `nBits` to the corpus: buckets/table = 2^nBits; keep
    *    expected bucket size ≲ maxBucket or recall silently drops to
    *    whatever survives the cap.
    */
  def lshTopK(
      vectors: DataFrame,
      k: Int,
      nTables: Int = 12,
      nBits: Int = 6,
      maxBucket: Int = 1000,
      multiProbe: Boolean = false,
      probeBits: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // multiprobe cost model: the probe side carries (1 + probeBits)×
    // the rows of the base side, and candidate volume scales with it —
    // measured on a ×20 dup-heavy 40k corpus at nBits=12: 34 s single
    // probe, 302 s flipping all 12 bits. Margin-ordered probing keeps
    // most of the recall at probeBits ≪ nBits; size nBits to the
    // corpus FIRST (2^nBits ≳ corpus/maxBucket) — multiprobe amplifies
    // a mis-sized table's degenerate buckets by the same factor.
    def bucketize(probe: Boolean) = base.select(
      col("id"),
      explode(graft.functions.HyperplaneFunctions
        .hyperplaneSig(col("vec"), nTables, nBits,
          probeBits = if (probe) math.min(probeBits, nBits) else 0))
        .as("bucket"))
    val bucketed = bucketize(false)
    // Hot-bucket cap via count-prepass + anti-join (same shape as
    // Dedup.bucketMemberPairs): a window count over the raw bucket
    // stream would materialize every bucket — including the degenerate
    // boilerplate bucket the cap exists to kill — in one task's window
    // buffer before dropping it (a 10⁸-member bucket = one straggler/
    // spill task at corpus scale). The count aggregate reduces
    // map-side to distinct buckets per partition, the hot set is tiny
    // by construction, and AQE broadcasts the anti-join at runtime.
    val hot = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .select("bucket")
    val capped = bucketed.join(hot, Seq("bucket"), "left_anti")
    // multiprobe: query side also probes Hamming-1 buckets; the
    // indexed side stays at base buckets so state doesn't grow
    val probeSide = if (multiProbe) bucketize(true) else capped
    // shuffle-hash on the bucket key: at corpus scale neither side is
    // broadcastable, and bucket ids are high-cardinality → well-spread
    val pairs = probeSide.as("a")
      .join(capped.hint("shuffle_hash").as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"))
      .distinct()
    // norms project ONCE per vector row before the pair joins (a
    // vector in p candidate pairs would otherwise recompute its norm
    // p times — see cosinePreNormed)
    val normed = base.select(col("id"), col("vec"), l2Norm(col("vec")).as("norm"))
    val cand = pairs
      .join(normed.select(col("id").as("query_id"), col("vec").as("q_vec"),
        col("norm").as("q_norm")), Seq("query_id"))
      .join(normed.select(col("id").as("neighbor_id"), col("vec").as("c_vec"),
        col("norm").as("c_norm")), Seq("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosinePreNormed(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
          .as("cos"))
    // same map-side k-heap reduction as the brute/PQ paths — one
    // reduction idiom across all four ANN families; identical rows by
    // the TopKNeighbors (cos desc, id asc) determinism contract
    RelationalOps
      .topKPerGroupPartial(
        cand, Seq("query_id"),
        score = col("cos"), id = col("neighbor_id"),
        k = k, scoreAscending = false,
        idName = "neighbor_id", scoreName = "cos")
      .select(col("query_id"), col("rn").as("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Recall@k of an approximate neighbor result against exact truth
    * (both in the [[bruteForceTopK]] output schema: query_id, rank,
    * neighbor_id, cosine). One output row — (n_queries, truth_pairs,
    * hits, recall_at_k) — so a CI gate is a single scalar assert and
    * the driver can track the value round-over-round. Truth rows drive
    * the join, so extra approximate queries are ignored and missing
    * ones count as misses (no silent denominator shrink).
    */
  def recallAgainst(approx: DataFrame, exact: DataFrame): DataFrame = {
    val truth = exact.select(col("query_id"), col("neighbor_id"))
    val marked = truth.join(
      approx.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")).distinct(),
      Seq("query_id", "neighbor_id"), "left")
    marked.agg(
      countDistinct(col("query_id")).as("n_queries"),
      count(lit(1)).as("truth_pairs"),
      sum(coalesce(col("hit"), lit(0))).as("hits"),
      round(sum(coalesce(col("hit"), lit(0))) / count(lit(1)), 4).as("recall_at_k"))
  }

  /** Embedding-cosine near-duplicate pairs: ids (a<b) whose cosine
    * exceeds `threshold`, via the LSH candidate path.
    */
  def cosineNearDupPairs(
      vectors: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    lshTopK(vectors, k = 50, idCol = idCol, vecCol = vecCol)
      .filter(col("cosine") >= threshold && col("query_id") < col("neighbor_id"))
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"), col("cosine"))
}
