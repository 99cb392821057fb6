package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions hook exposing the engine's custom Catalyst
  * expressions to SQL, so every capability reachable from the Scala
  * API is reachable from `spark.sql(...)` too:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Registered functions (all codegen'd or buffer-typed — no UDFs):
  *  - vec_dot(a, b)               float-array dot product (double)
  *  - long_array_agree(a, b)      count of positions where two long arrays agree
  *  - minhash_sig(shingles, k)    k 64-bit minhash minima of a string array
  *  - simhash64(tokens)           64-bit SimHash of a token array
  *  - hyperplane_sig(vec, t, b)   LSH bucket keys (t tables × b sign bits)
  *  - word_shingles(tokens, w)    w-token shingles of a token array
  *  - char_ngrams(s, n)           character n-grams of a string
  *  - rolling_hash31(s)           Karp-Rabin base-31 rolling hash
  *  - kmv_distinct(col, k)        KMV bottom-k distinct-count sketch (aggregate)
  *  - term_stats(terms)           (n_terms, n_distinct, top_count) of a string array
  *  - topk_neighbors(s, id, k, asc)  map-side partial top-k per group (aggregate)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // lakehouse TABLE functions (graft_snapshot / graft_history /
    // graft_diff): builders emit an unresolved leaf, the injected
    // rule — which gets the session — resolves it to the snapshot plan
    graft.plans.GraftTableFunctions.injectable.foreach(ext.injectTableFunction)
    ext.injectResolutionRule(session =>
      new graft.plans.GraftTableFunctions.ResolveGraftTableRef(session))
    // SQL DML (MERGE INTO / DELETE FROM / UPDATE) over log-managed
    // parquet paths → the log's own operators (GraftDml)
    ext.injectResolutionRule(session =>
      new graft.plans.GraftDml.ResolveGraftDml(session))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, fn: String, pos: Int): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a boolean literal, got $other")
  }

  private def fn(
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("vec_dot", "vec_dot(a, b) - dot product of two float arrays", {
      case Seq(a, b) => FloatVecDot(a, b)
      case args => throw new IllegalArgumentException(s"vec_dot takes 2 args, got ${args.length}")
    }),
    fn("long_array_agree",
      "long_array_agree(a, b) - positions where two long arrays agree", {
        case Seq(a, b) => LongArrayAgree(a, b)
        case args => throw new IllegalArgumentException(s"long_array_agree takes 2 args, got ${args.length}")
      }),
    fn("minhash_sig", "minhash_sig(shingles, k) - k minhash minima", {
      case Seq(sh, k) => MinHashSig(sh, intArg(k, "minhash_sig", 1))
      case args => throw new IllegalArgumentException(s"minhash_sig takes 2 args, got ${args.length}")
    }),
    fn("simhash64", "simhash64(tokens) - 64-bit SimHash", {
      case Seq(t) => SimHash64(t)
      case args => throw new IllegalArgumentException(s"simhash64 takes 1 arg, got ${args.length}")
    }),
    fn("hyperplane_sig",
      "hyperplane_sig(vec, nTables, nBits[, probeBits]) - LSH bucket keys", {
        case Seq(v, t, b) =>
          HyperplaneSig(v, intArg(t, "hyperplane_sig", 1), intArg(b, "hyperplane_sig", 2))
        case Seq(v, t, b, p) =>
          HyperplaneSig(v, intArg(t, "hyperplane_sig", 1), intArg(b, "hyperplane_sig", 2),
            intArg(p, "hyperplane_sig", 3))
        case args => throw new IllegalArgumentException(s"hyperplane_sig takes 3-4 args, got ${args.length}")
      }),
    fn("word_shingles", "word_shingles(tokens, w) - w-token shingles", {
      case Seq(t, w) => WordShinglesExpr(t, intArg(w, "word_shingles", 1))
      case args => throw new IllegalArgumentException(s"word_shingles takes 2 args, got ${args.length}")
    }),
    fn("char_ngrams", "char_ngrams(s, n) - character n-grams", {
      case Seq(s, n) => CharNGramsExpr(s, intArg(n, "char_ngrams", 1))
      case args => throw new IllegalArgumentException(s"char_ngrams takes 2 args, got ${args.length}")
    }),
    fn("rolling_hash31", "rolling_hash31(s) - Karp-Rabin base-31 hash", {
      case Seq(s) => RollingHash31(s)
      case args => throw new IllegalArgumentException(s"rolling_hash31 takes 1 arg, got ${args.length}")
    }),
    fn("kmv_distinct",
      "kmv_distinct(col, k) - approximate COUNT(DISTINCT) via KMV sketch", {
        case Seq(c, k) =>
          import org.apache.spark.sql.catalyst.expressions.{If, IsNull, XxHash64}
          import org.apache.spark.sql.types.LongType
          KmvDistinct(
            If(IsNull(c), Literal(null, LongType), XxHash64(Seq(c), 42L)),
            intArg(k, "kmv_distinct", 1)).toAggregateExpression()
        case args => throw new IllegalArgumentException(s"kmv_distinct takes 2 args, got ${args.length}")
      }),
    fn("term_stats",
      "term_stats(terms) - struct(n_terms, n_distinct, top_count) of a string array", {
        case Seq(t) => TokenTermStats(t)
        case args => throw new IllegalArgumentException(s"term_stats takes 1 arg, got ${args.length}")
      }),
    fn("topk_neighbors",
      "topk_neighbors(score, id, k, ascending) - map-side partial top-k per group; " +
        "array<struct<id, score>> in rank order (aggregate; score must be DOUBLE)", {
        case Seq(s, i, k, asc) =>
          TopKNeighbors(s, i, intArg(k, "topk_neighbors", 2),
            boolArg(asc, "topk_neighbors", 3)).toAggregateExpression()
        case args => throw new IllegalArgumentException(s"topk_neighbors takes 4 args, got ${args.length}")
      }))

  /** Install into an already-built session (tests, REPLs) — same
    * builders the `spark.sql.extensions` path injects.
    */
  def installInto(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = org.apache.spark.sql.GraftShim.functionRegistry(spark)
    functions.foreach { case (id, info, b) => reg.registerFunction(id, info, b) }
    val tvf = org.apache.spark.sql.GraftShim.tableFunctionRegistry(spark)
    graft.plans.GraftTableFunctions.bound(spark).foreach {
      case (id, info, b) => tvf.registerFunction(id, info, b)
    }
  }
}
