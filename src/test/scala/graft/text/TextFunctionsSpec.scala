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
}
