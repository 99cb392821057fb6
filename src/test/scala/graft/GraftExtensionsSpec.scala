package graft

import org.apache.spark.sql.functions._

/** SQL surface: every custom Catalyst expression is reachable from
  * `spark.sql(...)` via GraftExtensions (spark.sql.extensions config
  * on a fresh session, or installInto on an existing one) and agrees
  * with its Scala-API twin.
  */
class GraftExtensionsSpec extends SparkSpec {

  // shared session: install once before the suite's tests touch SQL
  GraftExtensions.installInto(spark)
  graft.Tables.embeddings(spark, sf("embeddings")).createOrReplaceTempView("emb")
  graft.Tables.documents(spark, sf("documents")).createOrReplaceTempView("docs")

  test("vec_dot from SQL equals the Scala column API") {
    val sql = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb ORDER BY vec_id LIMIT 5")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val api = graft.Tables.embeddings(spark, sf("embeddings"))
      .select(col("vec_id"), graft.similarity.Ann.dot(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sql.toSeq == api.toSeq)
  }

  test("minhash_sig / simhash64 / word_shingles / char_ngrams / rolling_hash31 from SQL") {
    val row = spark.sql(
      """SELECT
           minhash_sig(word_shingles(split(lower(text), '\\s+'), 3), 16) AS mh,
           simhash64(split(lower(text), '\\s+')) AS sh,
           char_ngrams(text, 4)[0] AS cg,
           rolling_hash31(text) AS rh
         FROM docs WHERE doc_id = 0""").head()
    assert(row.getSeq[Long](0).length == 16)
    assert(row.getLong(1) != 0L)
    assert(row.getString(2).length == 4)

    val apiSimhash = graft.Tables.documents(spark, sf("documents"))
      .filter(col("doc_id") === 0)
      .select(graft.dedup.Dedup.simhash(col("text"))).head().getLong(0)
    // SQL twin used the same tokenization (lower + whitespace split)
    assert(row.getLong(1) == apiSimhash)
  }

  test("term_stats from SQL equals the Scala column API") {
    val sql = spark.sql(
      """SELECT doc_id, term_stats(regexp_extract_all(lower(text), '\\S+', 0)) AS s
         FROM docs ORDER BY doc_id LIMIT 5""")
      .select(col("doc_id"), col("s.n_terms"), col("s.n_distinct"), col("s.top_count"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val api = graft.Tables.documents(spark, sf("documents"))
      .select(col("doc_id"),
        graft.text.TextFunctions.repetitionStats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_terms"), col("s.n_distinct"), col("s.top_count"))
      .orderBy("doc_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(sql.toSeq == api.toSeq)
  }

  test("kmv_distinct aggregate from SQL matches the Scala API") {
    graft.Tables.lineitem(spark, sf("lineitem")).createOrReplaceTempView("li")
    val sql = spark.sql("SELECT kmv_distinct(l_partkey, 256) FROM li").head().getLong(0)
    val api = graft.Tables.lineitem(spark, sf("lineitem"))
      .agg(graft.functions.SketchFunctions.kmvDistinct(col("l_partkey"), 256))
      .head().getLong(0)
    assert(sql == api)
  }

  test("hyperplane_sig from SQL produces nTables bucket keys") {
    val keys = spark.sql(
      "SELECT hyperplane_sig(embedding, 4, 6) FROM emb WHERE vec_id = 0")
      .head().getSeq[String](0)
    assert(keys.length == 4)
    assert(keys.forall(_.matches("\\d+#[01]{6}")))
  }

  test("topk_neighbors aggregate from SQL matches topKPerGroupPartial") {
    graft.Tables.lineitem(spark, sf("lineitem")).createOrReplaceTempView("li2")
    val sql = spark.sql(
      """SELECT l_returnflag, e.id, e.score
         FROM (SELECT l_returnflag,
                 topk_neighbors(CAST(l_quantity AS DOUBLE), l_orderkey, 3, false) AS tk
               FROM li2 GROUP BY l_returnflag)
         LATERAL VIEW posexplode(tk) t AS pos, e""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val api = graft.ops.RelationalOps.topKPerGroupPartial(
      graft.Tables.lineitem(spark, sf("lineitem")),
      keys = Seq("l_returnflag"),
      score = col("l_quantity").cast("double"),
      id = col("l_orderkey"),
      k = 3, scoreAscending = false,
      idName = "id", scoreName = "score")
      .select("l_returnflag", "id", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sql == api && sql.nonEmpty)
  }

  test("graft_snapshot / graft_history / graft_diff table functions from SQL") {
    import graft.ops.{DeleteWhere, TxLog}
    val dir = java.nio.file.Files.createTempDirectory("tvf").toString + "/t"
    val o = graft.Tables.orders(spark, sf("orders"))
    o.repartition(4).write.parquet(dir)
    TxLog.convert(spark, dir) // v0
    DeleteWhere.byKeys(spark, dir, "o_orderkey", Seq[Any](1L, 2L), None) // v1
    // time travel from SQL: v0 has the keys, current doesn't
    assert(spark.sql(
      s"SELECT count(*) FROM graft_snapshot('$dir', 0) WHERE o_orderkey IN (1, 2)")
      .head().getLong(0) == 2L)
    assert(spark.sql(
      s"SELECT count(*) FROM graft_snapshot('$dir') WHERE o_orderkey IN (1, 2)")
      .head().getLong(0) == 0L)
    // TVF output composes like any relation (joins, aggregates)
    val hist = spark.sql(
      s"SELECT version, n_adds, n_removes FROM graft_history('$dir') ORDER BY version")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(hist.length == 2 && hist(0)._1 == 0 && hist(1)._3 > 0,
      s"history: ${hist.mkString(", ")}")
    val d = spark.sql(
      s"""SELECT _change_type, count(*) AS n FROM graft_diff('$dir', 0, 1)
          GROUP BY 1 ORDER BY 1""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d("delete") - d.getOrElse("insert", 0L) == 2L)
    // a non-literal argument is rejected at planning, not silently read
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_snapshot(rand()::string)").collect()
    }

    // graft_scan: stats-declared epochs prune from the log in SQL
    val dir2 = java.nio.file.Files.createTempDirectory("tvf_scan").toString + "/t"
    TxLog.convert(spark, dir2)
    TxLog.setStatsColumns(spark, dir2, Seq("o_orderkey"))
    (0 until 4).foreach { e =>
      graft.streaming.TxLogIngest.appendSink(dir2)(
        o.filter(col("o_orderkey") % 4 === e).coalesce(1), e.toLong)
    }
    val scanned = spark.sql(
      s"SELECT count(*), min(o_orderkey) FROM graft_scan('$dir2', 'o_orderkey', 10, 50)")
      .head()
    val want = o.filter(col("o_orderkey").between(10, 50)).count()
    assert(scanned.getLong(0) == want && scanned.getLong(1) >= 10)

    // the extensions-config path: builders emit the unresolved
    // GraftTableRef leaf and the injected rule resolves it — exercise
    // the rule directly against the leaf the injectable builder makes
    import graft.plans.GraftTableFunctions
    import org.apache.spark.sql.catalyst.expressions.Literal
    val builder = GraftTableFunctions.injectable
      .find(_._1.funcName == "graft_snapshot").get._3
    val leaf = builder(Seq(Literal(org.apache.spark.unsafe.types.UTF8String
      .fromString(dir), org.apache.spark.sql.types.StringType), Literal(0)))
    assert(!leaf.resolved)
    val resolved = new GraftTableFunctions.ResolveGraftTableRef(spark)(leaf)
    assert(resolved.resolved)
    val viaRule = org.apache.spark.sql.GraftShim.ofRows(spark, resolved)
    assert(viaRule.filter(col("o_orderkey").isin(1L, 2L)).count() == 2L)
  }

  test("graft_hidden_range / graft_hidden_eq table functions from SQL") {
    import graft.ops.{PartitionTransforms, TxLog}
    val ev = graft.Tables.events(spark, sf("events"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("tvf_h").toString + "/t"
    PartitionTransforms.write(spark, ev, dir, Seq(
      PartitionTransforms.Days("ts"), PartitionTransforms.Bucket(4, "user_id")))
    val got = spark.sql(
      s"""SELECT count(*) FROM graft_hidden_range('$dir', 'ts',
            '2024-01-05 00:00:00', '2024-01-06 23:59:59')""").head().getLong(0)
    assert(got == ev.filter(col("ts").between(
      "2024-01-05 00:00:00", "2024-01-06 23:59:59")).count())
    // SQL integer literals against the BIGINT bucket column: the
    // table-type cast inside the scan must keep the pruning honest
    val eq = spark.sql(
      s"SELECT count(*) FROM graft_hidden_eq('$dir', 'user_id', 1, 2)")
      .head().getLong(0)
    assert(eq == ev.filter(col("user_id").isin(1L, 2L)).count())
    // composes like any relation — and never exposes the p_ columns
    val cols = spark.sql(
      s"SELECT * FROM graft_hidden_eq('$dir', 'user_id', 1)").columns
    assert(!cols.exists(_.startsWith("p_")))
    assert(TxLog.exists(spark, dir))
  }

  test("graft_files: per-file metadata accounts for rows, vectors and stats") {
    import graft.ops.{DeletionVectors, TxLog}
    val dir = java.nio.file.Files.createTempDirectory("tvf_f").toString + "/t"
    val o = graft.Tables.orders(spark, sf("orders"))
    o.repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)
    TxLog.convert(spark, dir)
    TxLog.setStatsColumns(spark, dir, Seq("o_orderkey"))
    DeletionVectors.delete(spark, dir, col("o_orderkey") <= 25)
    val m = spark.sql(s"SELECT * FROM graft_files('$dir')")
    assert(m.columns.toSeq ==
      Seq("file", "bytes", "rows", "dv", "stats", "dv_rows"))
    // footer rows minus hidden rows == the live relation, in SQL
    val live = spark.sql(
      s"SELECT sum(rows) - sum(dv_rows) FROM graft_files('$dir')")
      .head().getLong(0)
    assert(live == o.filter(col("o_orderkey") > 25).count())
    // exactly the key-sorted low file carries the vector
    val dvd = m.filter(col("dv").isNotNull).collect()
    assert(dvd.length >= 1 && dvd.forall(_.getLong(5) > 0))
    // time travel: at v0 nothing is hidden
    assert(spark.sql(
      s"SELECT sum(dv_rows) FROM graft_files('$dir', 0)")
      .head().getLong(0) == 0L)
  }

  test("graft_db: a DbLog database table reads (and time-travels) from SQL") {
    import graft.ops.DbLog
    val db = java.nio.file.Files.createTempDirectory("tvf_db").toString + "/db"
    val o = graft.Tables.orders(spark, sf("orders"))
    DbLog.create(spark, db)
    DbLog.transact(spark, db, "seed")(_.append("orders", o.repartition(4)))
    val vPre = DbLog.currentVersion(spark, db)
    DbLog.transact(spark, db, "archive") { txn =>
      txn.append("archive", txn.table("orders")
        .filter(col("o_orderstatus") === "F"))
      txn.deleteWhere("orders", col("o_orderstatus") === "F")
    }
    // the post-transaction cut, joined ACROSS tables in one SQL query
    val n = spark.sql(
      s"""SELECT (SELECT count(*) FROM graft_db('$db', 'orders')) +
                 (SELECT count(*) FROM graft_db('$db', 'archive')) AS n""")
      .head().getLong(0)
    assert(n == o.count())
    // whole-database time travel: the pre-cut has every row in orders
    assert(spark.sql(
      s"SELECT count(*) FROM graft_db('$db', 'orders', $vPre)")
      .head().getLong(0) == o.count())
    // TIMESTAMP AS OF on the database log: a cut between the two
    // transactions resolves to vPre via the in-commit stamps
    val at = graft.ops.TxLog.commitTimeMillis(spark, db, vPre)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone(
      spark.conf.get("spark.sql.session.timeZone")))
    assert(spark.sql(s"SELECT count(*) FROM graft_db('$db', 'orders', " +
      s"TIMESTAMP '${fmt.format(new java.util.Date(at))}')")
      .head().getLong(0) == o.count())
  }

  test("graft_enable_rowtracking / graft_rowids / keyless graft_changes from SQL") {
    import graft.ops.{DeletionVectors, TxLog}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tvf_rt").toString + "/t"
    (1L to 8L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1).sortWithinPartitions("k").write.parquet(dir)
    TxLog.convert(spark, dir)
    val r = spark.sql(s"SELECT * FROM graft_enable_rowtracking('$dir')")
    assert(r.count() == 1L)
    val ids = spark.sql(
      s"SELECT k, _row_id FROM graft_rowids('$dir') ORDER BY k")
      .as[(Long, Long)].collect()
    assert(ids.map(_._2).toSeq == (0L to 7L)) // sorted single file
    val v0 = TxLog.currentVersion(spark, dir)
    DeletionVectors.upsert(spark, dir,
      Seq((3L, "u"), (99L, "n")).toDF("k", "v"), keyCols = Seq("k"))
    // 3-arg form: update images pair by _row_id, no key list
    val feed = spark.sql(
      s"""SELECT _change_type, count(*) AS n
          FROM graft_changes('$dir', $v0, ${TxLog.currentVersion(spark, dir)})
          GROUP BY 1""").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(feed == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "insert" -> 1L))
  }

  test("graft_db_rename_column from SQL renames one table only") {
    import graft.ops.DbLog
    import spark.implicits._
    val db = java.nio.file.Files.createTempDirectory("tvf_dbrn").toString + "/db"
    DbLog.create(spark, db)
    DbLog.transact(spark, db, "seed") { t =>
      t.append("a", Seq((1L, "x")).toDF("id", "v"))
      t.append("b", Seq((2L, "y")).toDF("id", "v"))
    }
    spark.sql(s"SELECT * FROM graft_db_rename_column('$db', 'a', 'v', 'val')")
      .collect()
    assert(spark.sql(s"SELECT val FROM graft_db('$db', 'a')").count() == 1L)
    assert(DbLog.snapshot(spark, db, "b").columns.toSeq == Seq("id", "v"))
  }
}
