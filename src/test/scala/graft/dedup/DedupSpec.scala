package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (4L, "completely different content about database engines and query optimizers"),
    (5L, "THE  QUICK brown fox jumps over the lazy dog near the river bank today") // dup modulo case/ws
  ).toDF("doc_id", "text")

  test("exactGroups collapses case/whitespace-normalized duplicates") {
    val g = Dedup.exactGroups(docs).collect()
    assert(g.length == 3)
    val big = g.find(_.getAs[Long]("dups") == 3L).get
    assert(big.getAs[Long]("keep_id") == 1L)
  }

  test("exactDedup keeps min-id row per content") {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("minhashCandidates finds the near-dup pair, not the unrelated doc") {
    val cand = Dedup.minhashCandidates(docs, shingleWidth = 2, k = 64, bands = 16,
      threshold = 0.3).collect()
    val pairs = cand.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near-dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated never pairs
  }

  test("minhashDedup drops near-duplicates of lower ids") {
    val kept = Dedup.minhashDedup(docs, threshold = 0.9)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.contains(1L) && kept.contains(4L))
    assert(!kept.contains(2L)) // exact dup must go
  }

  test("minhashDedupFixpoint collapses transitive chains to the component min id") {
    // chain through the HIGHEST id: 13 = A++B overlaps both halves,
    // but A (11) and B (12) share no shingles. Candidate edges are
    // (11,13) and (12,13) only. One-hop drops just 13 (12 is never an
    // id_b of a surviving-pair); the component rule keeps exactly the
    // min id 11.
    val a = (0 until 40).map(i => s"alpha$i").mkString(" ")
    val b = (0 until 40).map(i => s"beta$i").mkString(" ")
    val chain = Seq(
      (11L, a), (12L, b), (13L, s"$a $b"),
      (14L, "totally unrelated standalone document about graph algorithms")
    ).toDF("doc_id", "text")
    // r=2 bands so the ~0.49-jaccard half/whole pairs reliably collide
    val kept = Dedup.minhashDedupFixpoint(chain, threshold = 0.3, bands = 32)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(11L, 14L), s"kept ${kept.toSeq}")
    // the one-hop approximation keeps 12 on the same input (chain case)
    val oneHop = Dedup.minhashDedup(chain, threshold = 0.3)
      .select("doc_id").as[Long].collect().sorted
    assert(oneHop.contains(11L) && oneHop.contains(14L))
  }

  test("componentDedupStar: 64-node path graph converges within the O(log n) bound") {
    // the chain is label propagation's worst case (diameter 63 > the
    // default 20-iteration bound); the star alternation must collapse
    // it to the single component min well inside maxIters = 10
    val nodes = (0L until 64L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val kept = Dedup.componentDedupStar(nodes, chain, maxIters = 10)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L), s"kept ${kept.toSeq}")
  }

  test("minhashDedupIncremental: corpus dups drop regardless of id order, batch keeps min") {
    val a = (0 until 40).map(i => s"alpha$i").mkString(" ")
    val c = (0 until 40).map(i => s"gamma$i").mkString(" ")
    // existing corpus deliberately has LARGER ids than the batch: the
    // "near-dup of ANY existing" rule must not depend on id order
    val existing = Seq(
      (100L, a),
      (101L, "standalone corpus text about physical plans and shuffles")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, a + " tail"),          // near-dup of existing 100 -> drop
      (2L, c),                    // novel -> keep
      (3L, c + " tail"),          // near-dup of smaller batch doc 2 -> drop
      (4L, a.toUpperCase),        // exact dup (normalized) of existing -> drop
      (5L, "fresh unrelated words entirely about streaming watermarks")
    ).toDF("doc_id", "text")
    val kept = Dedup.minhashDedupIncremental(incoming, existing, threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 5L), s"kept ${kept.toSeq}")
    // an empty corpus degrades to plain batch dedup
    val selfOnly = Dedup.minhashDedupIncremental(
      incoming, existing.limit(0), threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted
    assert(selfOnly.toSeq == Seq(1L, 2L, 5L), s"kept ${selfOnly.toSeq}")
  }

  test("incremental hot buckets sample the corpus instead of bypassing near-dedup") {
    // 300 near-identical boilerplate corpus docs: every band bucket the
    // incoming dup touches is hot (corpus membership >> maxBucket = 20).
    // The old whole-bucket drop would let the incoming copy through;
    // sampling must still pair it with boilerplate representatives.
    val boiler = (0 until 60).map(i => s"boiler$i").mkString(" ")
    val existing = (100L until 400L).map(i => (i, s"$boiler v$i"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (1L, boiler + " incoming"),  // near-dup of the hot boilerplate -> drop
      (2L, "completely novel text about watermark state eviction")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatesAgainst(
      incoming, existing, threshold = 0.6, maxBucket = 20)
    val flagged = pairs.select("id_new").as[Long].collect().toSet
    assert(flagged.contains(1L), s"hot-bucket incoming doc not flagged: $flagged")
    assert(!flagged.contains(2L))
    // the sample bounds the pair fan-out: doc 1 pairs with a subset of
    // the corpus, not all 300 members
    val doc1Pairs = pairs.filter($"id_new" === 1L).count()
    assert(doc1Pairs > 0 && doc1Pairs < 300, s"doc1 pairs: $doc1Pairs")

    // a boilerplate-heavy BATCH is bounded too: the build side of the
    // pair join thins to ~maxBucket representatives per bucket, so
    // total pairs are ≤ members·maxBucket·bands (640k here) instead
    // of the members²/2 ≈ 2M an uncapped all-pairs bucket would form,
    // while every doc still probes and the non-minimum dups all drop
    val bigBatch = (1L to 2000L).map(i => (i, s"$boiler batch$i"))
      .toDF("doc_id", "text")
    val batchPairs = Dedup.minhashCandidatesAgainst(
      bigBatch, existing.limit(0), threshold = 0.6, maxBucket = 20)
    val nPairs = batchPairs.count()
    assert(nPairs <= 2000L * 20 * 16, s"batch fan-out not bounded: $nPairs pairs")
    val kept = Dedup.minhashDedupIncremental(
      bigBatch, existing.limit(0), threshold = 0.6)
    assert(kept.count() < 10, s"boilerplate batch not deduped: ${kept.count()} kept")
  }

  test("componentRepresentatives keeps the best-scored doc per cluster, singletons survive") {
    val docs = Seq(
      (1L, "a", 0.2), (2L, "b", 0.9), (3L, "c", 0.5),  // cluster {1,2,3} -> 2 wins
      (4L, "d", 0.4), (5L, "e", 0.4),                  // cluster {4,5} -> tie, min id 4
      (9L, "z", 0.1)                                   // singleton -> survives
    ).toDF("doc_id", "text", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val reps = Dedup.componentRepresentatives(docs, pairs, scoreExpr = col("q"))
      .select("cluster", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps == Map(1L -> 2L, 4L -> 4L, 9L -> 9L), reps.toString)
  }

  test("componentLabels: every node labeled with its component min, roots label themselves") {
    val pairs = Seq((2L, 5L), (5L, 7L), (10L, 11L), (11L, 12L), (16L, 19L))
      .toDF("id_a", "id_b")
    val labels = Dedup.componentLabels(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      2L -> 2L, 5L -> 2L, 7L -> 2L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      16L -> 16L, 19L -> 16L), labels.toString)
    // no duplicate nodes (one label each)
    assert(Dedup.componentLabels(pairs).count() == labels.size)
  }

  test("componentDedupStar agrees with componentDedup on a mixed clique+chain graph") {
    val nodes = (0L until 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (
      Seq((2L, 5L), (5L, 7L), (2L, 7L)) ++   // clique {2,5,7}
      Seq((10L, 11L), (11L, 12L), (12L, 13L)) ++ // chain 10-13
      Seq((16L, 19L))                        // pair
    ).toDF("id_a", "id_b")
    val star = Dedup.componentDedupStar(nodes, pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val label = Dedup.componentDedup(nodes, pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(star == label, s"star $star != label $label")
    assert(star == (0L until 20L).filterNot(Set(5L, 7L, 11L, 12L, 13L, 19L)).toSeq)
  }

  test("minhash candidate recall gate: >= 0.9 of exact-Jaccard-0.7 pairs surface") {
    val r = graft.Queries.qDedupMinhashRecall(spark, sf("")).head()
    val truthPairs = r.getAs[Long]("truth_pairs")
    assert(truthPairs > 0, "corpus has no high-Jaccard pairs; gate is vacuous")
    val recall = r.getAs[Double]("recall")
    assert(recall >= 0.9, s"minhash candidate recall $recall < 0.9 over $truthPairs true pairs")
  }

  test("simhash pigeonhole invariant: banded pairs == exact Hamming<=3 pairs") {
    val corpus = graft.Tables.documents(spark, sf("documents"))
      .filter(col("doc_id") < 200)
    val sigs = corpus.select(col("doc_id").as("id"), Dedup.simhash(col("text")).as("sig"))
    val exact = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
      .join(broadcast(sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))),
        col("id_a") < col("id_b"))
      .filter(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashNearDupPairs(corpus, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Hamming<=3 over 4 16-bit bands GUARANTEES a shared band (pigeonhole),
    // and the post-filter re-checks Hamming — so with no hot-bucket drops
    // the two sets must be IDENTICAL, not merely overlapping
    assert(banded == exact,
      s"banded missing ${exact -- banded}, extra ${banded -- exact}")
  }

  test("simhash identical for identical docs, different for unrelated") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("s")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) == sigs(5L)) // case/ws-normalized tokens
    assert(sigs(1L) != sigs(4L))
    // near-dup within small Hamming distance
    val ham = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(ham <= 16, s"hamming $ham")
  }

  test("simhashNearDupPairs pairs exact/near dups, skips unrelated") {
    val pairs = Dedup.simhashNearDupPairs(docs, maxHamming = 16).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical → hamming 0
    assert(pairs.contains((1L, 5L))) // normalized-identical
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("duplicateSpans: keep-first, overlap merge, sub-n runs invisible") {
    import spark.implicits._
    // doc 1 carries the canonical 5-token run "p q r s t" at pos 2;
    // doc 2 repeats it at pos 0 AND extends it by one shared token u
    // (pos 0..5 → grams at 0 and 1 both duplicated vs docs 1/3: the
    // two marked [0,5) and [1,6) ranges must MERGE to one [0,6) span);
    // doc 3 repeats "q r s t u" (pos 3); doc 4 shares only a 3-token
    // run (< n) — invisible at n=5
    val docs = Seq(
      (1L, "a b p q r s t z"),
      (2L, "p q r s t u m m2 m3"),
      (3L, "c d e q r s t u"),
      (4L, "r s t only three here")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, n = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // first occurrence of "p q r s t" = (doc 1, pos 2): doc 1 keeps it;
    // first occurrence of "q r s t u" = (doc 2, pos 1) — but doc 2's
    // [0,5) and [1,6) CANNOT both survive: gram "p q r s t" at (2,0) is
    // a duplicate (first is doc 1), gram "q r s t u" at (2,1) is the
    // FIRST of its kind, so doc 2 only removes [0,5); doc 3 removes
    // its "q r s t u" occurrence [3,8)
    assert(spans == Set((2L, 0, 5), (3L, 3, 8)), spans.toString)

    val clean = Dedup.removeDuplicateSpans(docs, n = 5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) == "a b p q r s t z") // keeper untouched (normalized)
    assert(clean(2L) == "u m m2 m3")
    assert(clean(3L) == "c d e")
    assert(clean(4L) == "r s t only three here")
  }

  test("duplicateSpans merges overlapping marked grams into one span") {
    import spark.implicits._
    // doc 11 repeats doc 10's 7-token run: at n=5 that is three
    // overlapping duplicated grams (pos 0,1,2) which must merge into
    // ONE [0,7) span, not three
    val docs = Seq(
      (10L, "t1 t2 t3 t4 t5 t6 t7"),
      (11L, "t1 t2 t3 t4 t5 t6 t7 tail x y")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, n = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.toSeq == Seq((11L, 0, 7)), spans.mkString(", "))
    val clean = Dedup.removeDuplicateSpans(docs, n = 5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(11L) == "tail x y")
  }

  test("a 2n-token duplicated run excises as ONE span at gram width n AND 2n") {
    import spark.implicits._
    // the fixed-n approximation finds duplicated runs >= n exactly (as
    // merged runs of overlapping duplicated grams): a 10-token run
    // must come out as one [pos, pos+10) span whether matched with
    // 5-grams or 10-grams
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run alpha beta"),
      (2L, s"x y z $run tail")).toDF("doc_id", "text")
    for (n <- Seq(5, 10)) {
      val spans = Dedup.duplicateSpans(docs, n = n).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
      assert(spans == Seq((2L, 3, 13)), s"n=$n: ${spans.mkString(", ")}")
      val clean = Dedup.removeDuplicateSpans(docs, n = n).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(clean(2L) == "x y z tail", s"n=$n: ${clean(2L)}")
    }
  }

  test("duplicateSpans hashed production mode equals the portable string mode") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    def spans(hash: Boolean) = Dedup.duplicateSpans(docs, n = 8, hashGrams = hash)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val hashed = spans(true)
    assert(hashed == spans(false))
    assert(hashed.nonEmpty) // the corpus does carry duplicated runs
  }

  test("removeDuplicateSpans excises correctly when the span set cannot broadcast") {
    // VERDICT r6 #1: the span set is corpus-proportional, so the
    // excision must survive a plan where broadcasting it is forbidden
    // (the 100 TB case). Force every join to shuffle and check the
    // result is bit-identical to the default-config run.
    val docs = graft.Tables.documents(spark, sf("documents"))
    def run() = Dedup.removeDuplicateSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val withBroadcast = run()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(run() == withBroadcast)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dupRuns reports the longest duplicated run to x2 resolution") {
    // a 16-token run shared by docs 1 and 2, plus a 4-token run shared
    // by docs 1 and 3 — base width 4, levels 3 → widths 4/8/16
    val run16 = (1 to 16).map(i => s"r$i").mkString(" ")
    val run4 = "a b c d"
    val docs = Seq(
      (1L, s"$run16 pad1 $run4"),
      (2L, s"lead lead2 $run16 tailx"),
      (3L, s"$run4 other words here")).toDF("doc_id", "text")
    val runs = Dedup.dupRuns(docs, n = 4, levels = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // doc 1: positions 0..12 start dup windows; pos 0 carries width 16
    assert(runs((1L, 0)) == 16)
    assert(runs((2L, 2)) == 16)
    // pos 4 of doc 1: remaining shared run is 12 tokens → widest
    // duplicated power-of-two window is 8
    assert(runs((1L, 4)) == 8)
    // the 4-token run: width 4 only, at its own start (pos 17 = after
    // the 16 r-tokens and pad1)
    assert(runs((1L, 17)) == 4)
    assert(runs((3L, 0)) == 4)
    // no position claims a wider run than exists
    assert(!runs.values.exists(_ > 16))
    val stats = Dedup.dupRunStats(docs, n = 4, levels = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(stats(1L)._2 == 16 && stats(3L) == ((1L, 4)))
  }

  test("dupRuns hashed doubling recurrence equals the portable string mode") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    def runs(hash: Boolean) = Dedup.dupRuns(docs, n = 4, levels = 4, hashGrams = hash)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val hashed = runs(true)
    assert(hashed == runs(false))
    assert(hashed.nonEmpty)
  }

  test("ngramJaccard: identical → 1.0, near-dup high, unrelated low") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(docs, pairs, n = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.6)
    assert(j((1L, 4L)) < 0.2)
  }
}
