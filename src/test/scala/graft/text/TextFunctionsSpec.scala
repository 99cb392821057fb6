package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("t").select(c.as("v")).head()

  test("tokenCount handles empty / repeated whitespace") {
    assert(one(tokenCount(col("t")), "a  b\tc\nd").getInt(0) == 4)
    assert(one(tokenCount(col("t")), "").getInt(0) == 0)
    assert(one(tokenCount(col("t")), "   ").getInt(0) == 0)
  }

  test("punct and stopword counting") {
    assert(one(punctCount(col("t")), "Hi, there! Ok?").getInt(0) == 3)
    assert(one(stopwordCount(col("t")), "The cat and a dog of note").getInt(0) == 4)
  }

  test("qualityScore in [0,1], monotone-ish in stopword presence") {
    val lo = one(qualityScore(col("t")), "xxx yyy zzz").getDouble(0)
    val hi = one(qualityScore(col("t")), ("the quick fox and a dog " * 20)).getDouble(0)
    assert(lo >= 0.0 && hi <= 1.0 && hi > lo)
  }

  test("langId votes marker words; 'und' when none fire") {
    assert(one(langId(col("t")), "the cat sat with the hat").getString(0) == "en")
    assert(one(langId(col("t")), "der hund und die katze ist").getString(0) == "de")
    assert(one(langId(col("t")), "qwerty zxcvb").getString(0) == "und")
  }

  test("normalized + fingerprint stable under whitespace/case changes") {
    val a = one(fingerprintMd5(col("t")), "Hello   World")
    val b = one(fingerprintMd5(col("t")), "hello world ")
    assert(a.getString(0) == b.getString(0))
  }

  test("wordShingles produce n-w+1 shingles; short docs yield one") {
    val sh = one(wordShingles(col("t"), 3), "a b c d e").getSeq[String](0)
    assert(sh == Seq("a b c", "b c d", "c d e"))
    assert(one(wordShingles(col("t"), 3), "a b").getSeq[String](0) == Seq("a b"))
  }

  test("charShingles slide over normalized text") {
    val sh = one(charShingles(col("t"), 3), "abcd").getSeq[String](0)
    assert(sh == Seq("abc", "bcd"))
  }

  test("bpeTokenCount splits letter/digit/punct runs") {
    // "don't stop 123!!" → " don"|"'"|"t"|" stop"|" 123"|"!!" = 6
    assert(one(bpeTokenCount(col("t")), "don't stop 123!!").getInt(0) == 6)
    assert(one(bpeTokenCount(col("t")), "").getInt(0) == 0)
  }

  test("rollingHash is the byte polynomial mod 1e9+7") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    for (s <- Seq("abc", "hello world", "", "aab", "aba")) {
      assert(one(rollingHash(col("t")), s).getLong(0) == ref(s), s"for '$s'")
    }
  }

  test("redactPii scrubs urls, emails, long digit runs — in that order") {
    def red(s: String) = one(redactPii(col("t")), s).getString(0)
    assert(red("mail me at bob.smith+x@corp.example.org today") ==
      "mail me at <EMAIL> today")
    assert(red("see https://a.example/path?q=1 now") == "see <URL> now")
    assert(red("id 12345678 ok 123456 ok") == "id <NUM> ok 123456 ok") // 6 digits survive
    // a URL containing an email-like part is consumed as a URL first
    assert(red("http://x.example/a@b.example/c d") == "<URL> d")
    assert(red("clean text stays clean") == "clean text stays clean")
  }

  test("chunkDocuments: windows, overlap, short and empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 80).map(i => s"w$i").mkString(" ")), // 80 tokens
      (2L, "a b c"),                                  // shorter than one window
      (3L, "")                                        // empty
    ).toDF("doc_id", "text")
    val out = chunkDocuments(docs, chunkTokens = 32, overlapTokens = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    // 80 tokens, stride 24: starts 0,24,48 -> ceil((80-32)/24)=2 -> 3 chunks
    val d1 = byDoc(1L).sortBy(_._2)
    assert(d1.length == 3, d1.mkString(","))
    assert(d1(0)._3.startsWith("w1 w2 ") && d1(0)._4 == 32L)
    assert(d1(1)._3.startsWith("w25 ") && d1(1)._4 == 32L) // overlap of 8
    assert(d1(2)._3.startsWith("w49 ") && d1(2)._4 == 32L)
    assert(d1(2)._3.endsWith(" w80"))
    // short doc: one chunk, all tokens
    assert(byDoc(2L).toSeq == Seq((2L, 0, "a b c", 3L)))
    // empty doc: one empty chunk — the doc does not disappear
    assert(byDoc(3L).toSeq == Seq((3L, 0, "", 0L)))
    // every token of doc 1 appears in at least one chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert((1 to 80).forall(i => covered.contains(s"w$i")))
  }

  test("repetitionStats counts terms, distinct terms, and the top count") {
    def stats(s: String, n: Int = 1): (Int, Int, Int) = {
      val r = one(repetitionStats(col("t"), n), s).getStruct(0)
      (r.getInt(0), r.getInt(1), r.getInt(2))
    }
    // lowercased tokens: a b a c a b → a:3 b:2 c:1
    assert(stats("a b a c a B") == (6, 3, 3))
    assert(stats("") == (0, 0, 0))
    assert(stats("same same same") == (3, 1, 3))
    // bigrams of "x y x y x": [x y, y x, x y, y x] → 4 terms, 2 distinct, top 2
    assert(stats("x y x y x", n = 2) == (4, 2, 2))
    // wordShingles contract: a doc shorter than w yields ONE shingle
    // (the whole doc — empty string for an empty doc)
    assert(stats("one", n = 2) == (1, 1, 1))
    assert(stats("", n = 2) == (1, 1, 1))
  }

  test("repetitionStats (native) matches the explode-groupBy formulation on real docs") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val native = docs.select(
      col("doc_id"), repetitionStats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_terms"), col("s.n_distinct"), col("s.top_count"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val viaShuffle = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").cast("int").as("t"), count(lit(1)).cast("int").as("d"),
        max("n").cast("int").as("m"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    viaShuffle.foreach { case (id, expected) =>
      assert(native(id) == expected, s"doc $id: ${native(id)} vs $expected")
    }
  }
}
