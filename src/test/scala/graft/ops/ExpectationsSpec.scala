package graft.ops

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {

  import Expectations._

  test("every rule counts exactly; nulls violate only not_null; pass flags gate") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "a", 10.0, "1-URGENT"),
      (Some(1L), "a", -5.0, "2-HIGH"),   // dup key pair; below range
      (Some(2L), "x", 50.0, "1-URGENT"), // 'x' not accepted
      (None, "b", 999.0, "junk"),        // null id; above range; bad regex
      (Some(3L), "b", 20.0, "1-URGENT")
    ).toDF("id", "status", "price", "prio")

    val rep = check(df, Seq(
      NotNull("id"),
      Unique(Seq("id")),
      AcceptedValues("status", Seq("a", "b")),
      InRange("price", 0.0, 100.0),
      MatchesRegex("prio", "^[12]-"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

    assert(rep("not_null(id)") == ((1L, 5L, false)))
    // 5 rows, 4 distinct id values (1,2,null,3) → 1 extra
    assert(rep("unique(id)") == ((1L, 5L, false)))
    assert(rep("accepted_values(status)") == ((1L, 5L, false)))
    // -5 and 999 out of range; null price impossible here
    assert(rep("in_range(price)") == ((2L, 5L, false)))
    assert(rep("matches_regex(prio)") == ((1L, 5L, false)))

    val clean = check(df.filter($"id".isNotNull && $"price".between(0, 100) &&
      $"status".isin("a", "b") && $"id" =!= 1L), Seq(NotNull("id"), Unique(Seq("id"))))
    assert(clean.collect().forall(_.getBoolean(3)))
  }

  test("checkByGroup scopes counts and uniqueness within each group") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1L)), ("a", Some(1L)), ("a", None),
      ("b", Some(1L)), ("b", Some(2L))
    ).toDF("g", "id")
    val rep = checkByGroup(df, Seq("g"), Seq(NotNull("id"), Unique(Seq("id"))))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // group a: 3 rows, id=1 twice (1 dup) and a null
    assert(rep(("a", "not_null(id)")) == ((1L, 3L, false)))
    assert(rep(("a", "unique(id)")) == ((1L, 3L, false)))
    // group b: same id value as group a — but uniqueness is per group
    assert(rep(("b", "not_null(id)")) == ((0L, 2L, true)))
    assert(rep(("b", "unique(id)")) == ((0L, 2L, true)))
  }

  test("quarantine tags rows with declaration-ordered reasons; unique is refused") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), 10.0), (None, -3.0), (Some(2L), 999.0), (Some(3L), 50.0)
    ).toDF("id", "price")
    val rules = Seq(NotNull("id"), InRange("price", 0.0, 100.0))
    val tagged = quarantine(df, rules).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getString(r.fieldIndex("__dq_reasons")))).toMap
    assert(tagged(Some(1L)) == "" && tagged(Some(3L)) == "")
    assert(tagged(None) == "not_null(id)|in_range(price)")
    assert(tagged(Some(2L)) == "in_range(price)")
    intercept[IllegalArgumentException] {
      quarantine(df, Seq(Unique(Seq("id"))))
    }
  }
}
