package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (whole-stage-codegen'd, no UDFs) so the hot path over 100 TB of
  * documents stays inside Tungsten. Each primitive is a pure
  * Column → Column function, usable in any projection and fully
  * pushdown/pruning-friendly.
  */
object TextFunctions {

  /** Whitespace-delimited token count. `\S+` extraction (rather than
    * split-on-space) so empty strings and repeated whitespace count 0/1
    * correctly.
    */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+"))

  /** Tokens as an array (whitespace segmentation, lowercased). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.!?,;:]"))

  /** Count of English stopword occurrences (word-boundary matched). */
  def stopwordCount(text: Column): Column =
    regexp_count(lower(text), lit("\\b(the|a|an|and|of|to|in|is|it)\\b"))

  /** Heuristic quality score in [0,1]: favors mid-length documents with
    * a sane stopword ratio and some punctuation — the classic cheap
    * pre-filter before expensive dedup/embedding stages. All arithmetic
    * is per-row (no shuffle), deterministic, codegen'd.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val stopRatio = when(nTok > 0, stopwordCount(text) / nTok).otherwise(lit(0.0))
    val stopScore = least(stopRatio * lit(4.0), lit(1.0))
    // raw double, not rounded: identical op order reproduces bitwise in
    // any IEEE-754 engine, while decimal rounding of boundary values
    // (x.xxx5) is engine-dependent
    (lenScore + stopScore) / lit(2.0)
  }

  /** Language-ID by stopword-marker voting: count hits of per-language
    * marker words, predict the argmax, 'und' (undetermined) when no
    * marker fires. Ties broken by fixed language order (en,de,fr,es) —
    * deterministic. A real pipeline would use char-n-gram profiles; the
    * shape (per-row scoring, no shuffle) is identical.
    */
  def langId(text: Column): Column = {
    val t = lower(text)
    def hits(pat: String): Column = regexp_count(t, lit(pat))
    val en = hits("\\b(the|and|of|to|is|you|that|it|with)\\b")
    val de = hits("\\b(der|die|und|das|ist|nicht|ich|ein|mit)\\b")
    val fr = hits("\\b(le|la|les|et|est|vous|que|pour|dans)\\b")
    val es = hits("\\b(el|los|las|es|una|por|con|para|del)\\b")
    when(greatest(en, de, fr, es) === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** BPE-ish subword token count: letter runs, digit runs, and
    * punctuation runs (each with an optional leading space) — the
    * GPT-2 pre-tokenizer shape, minus lookahead so the pattern runs
    * identically on RE2-based engines (DuckDB) and Java regex.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(" ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+"))

  /** Karp-Rabin rolling fingerprint (portable integer polynomial —
    * oracle-reproducible, unlike engine-library hashes). Native
    * codegen expression.
    */
  def rollingHash(text: Column): Column =
    graft.functions.RollingHashFunctions.rollingHash31(text)

  /** Whitespace-normalized lowercase form — canonicalization used by
    * every fingerprint/dedup stage.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact-dup fingerprint: md5 of the normalized text. Stable across
    * engines (md5 is standard), so it doubles as the exact-dedup key.
    */
  def fingerprintMd5(text: Column): Column =
    md5(normalized(text))

  /** 64-bit content fingerprint (xxhash64 of normalized text) — cheaper
    * than md5 for shuffle keys; Spark-internal hash, not for oracles.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(normalized(text))

  /** Word w-shingles of the normalized text: contiguous runs of
    * `w` tokens joined by a single space. Native expression — the HOF
    * formulation re-evaluated the tokenize subtree per shingle
    * position (O(n²) per row, interpreted).
    */
  def wordShingles(text: Column, w: Int): Column =
    graft.functions.ShingleFunctions.wordShingles(tokens(text), w)

  /** Character n-grams of the normalized text (native expression —
    * same O(n²) HOF pitfall as wordShingles).
    */
  def charShingles(text: Column, n: Int): Column =
    graft.functions.ShingleFunctions.charNGrams(normalized(text), n)

  /** Repetition statistics over word n-grams — the C4/Gopher-style
    * quality signals: returns struct(n_terms, n_distinct, top_count)
    * for the document's `n`-gram multiset. Callers derive the filter
    * ratios (duplicate-term fraction `1 − n_distinct/n_terms`,
    * top-term occupancy `top_count/n_terms`) and gate on them — the
    * standard guards against boilerplate and template spam. One
    * hash-counting pass per row (native expression), no shuffle.
    */
  def repetitionStats(text: Column, n: Int = 1): Column = {
    val terms = if (n == 1) tokens(text) else wordShingles(text, n)
    graft.functions.TokenStatsFunctions.termStats(terms)
  }

  /** PII redaction: URLs, emails, then long digit runs (7+) replaced
    * with typed placeholder tokens — the standard scrub before
    * training-data release. Order matters (URLs first, or an email
    * inside a URL leaves a dangling scheme) and is part of the
    * contract. Pure per-row `regexp_replace` chain: codegen'd, no
    * shuffle, and the patterns avoid lookaround so RE2-based engines
    * (the DuckDB oracle included) execute them identically.
    */
  def redactPii(text: Column): Column = {
    val url = regexp_replace(text, "https?://\\S+", "<URL>")
    val email = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(email, "[0-9]{7,}", "<NUM>")
  }

  /** Sliding-window document chunking: split each document's token
    * stream into `chunkTokens`-token windows advancing by
    * `chunkTokens - overlapTokens` — the context-window preparation
    * step between cleaning and packing. One row per (doc, window):
    * (idCol, chunk_idx, chunk_text, chunk_tokens). A document shorter
    * than one window yields exactly one (possibly empty) chunk, so no
    * document silently disappears.
    *
    * Per-row shape: tokenize once, `sequence` + `posexplode` the
    * window starts, `slice`/`concat_ws` per window — all codegen'd
    * builtins (no interpreted lambdas), no shuffle; output size is
    * input tokens × chunk/(chunk−overlap).
    */
  def chunkDocuments(
      docs: org.apache.spark.sql.DataFrame,
      chunkTokens: Int,
      overlapTokens: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlapTokens vs $chunkTokens")
    val stride = chunkTokens - overlapTokens
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // last window start index: ceil(max(n - chunk, 0) / stride)
      .withColumn("__m",
        expr(s"CAST((greatest(__n - $chunkTokens, 0) + ${stride - 1}) div $stride AS INT)"))
    base
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__m"))).as(Seq("__p", "__i")))
      .select(
        col(idCol),
        col("__i").as("chunk_idx"),
        concat_ws(" ",
          slice(col("__toks"), col("__i") * stride + 1, lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__toks"), col("__i") * stride + 1, lit(chunkTokens)))
          .cast("long").as("chunk_tokens"))
  }

  /** Winnowing fingerprint statistics (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03): hash every k-gram with the Karp-Rabin polynomial,
    * take the minimum in each sliding window of `w` consecutive
    * k-gram hashes (full windows only), and summarize the selected
    * fingerprint SET per document. The guarantee: any shared
    * substring of length ≥ k+w−1 yields at least one shared selected
    * fingerprint, so the per-doc fingerprint sets drive
    * copy-detection joins at a w-fold reduced index size.
    *
    * Per-doc shape: explode k-grams (pos, hash) → one window pass
    * partitioned by doc → distinct-min aggregation. One shuffle on
    * the doc id; the window is per-document and bounded by doc
    * length. Output: n_fp, fp_min, fp_max, fp_sum (deterministic
    * integer arithmetic — oracle-reproducible).
    */
  def winnowStats(
      docs: org.apache.spark.sql.DataFrame,
      k: Int = 8,
      w: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(
      col(idCol),
      posexplode(charShingles(col(textCol), k)).as(Seq("pos", "gram")))
    val hashed = grams.select(
      col(idCol), col("pos"), rollingHash(col("gram")).as("h"))
    val winMin = Window.partitionBy(idCol).orderBy("pos").rowsBetween(0, w - 1)
    val all = Window.partitionBy(idCol)
    hashed
      .withColumn("wmin", min("h").over(winMin))
      .withColumn("n", count(lit(1)).over(all))
      .filter(col("pos") <= col("n") - w) // full windows only
      .groupBy(idCol)
      .agg(
        countDistinct(col("wmin")).as("n_fp"),
        min("wmin").as("fp_min"),
        max("wmin").as("fp_max"),
        sum_distinct(col("wmin")).as("fp_sum"))
  }
}
