package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("top terms are ranked by (score desc, term asc), at most k per doc") {
    val docs = graft.Tables.documents(spark, sf("documents"))
    val top = Tfidf.topTerms(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(top.nonEmpty)
    top.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1 to rows.length))
      ordered.sliding(2).foreach {
        case Array((_, _, t1, s1), (_, _, t2, s2)) =>
          assert(s1 > s2 || (s1 == s2 && t1 < t2))
        case _ =>
      }
    }
  }

  test("a term unique to one doc outranks corpus-universal terms there") {
    val docs = Seq(
      (0L, "alpha beta gamma zzyzx"),
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val top1 = Tfidf.topTerms(docs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top1(0L) == "zzyzx")
  }
}
