package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("expectations: each class counts its violations exactly") {
    val df = Seq(
      (1L, Some(5.0), "A", "ok"),
      (2L, Some(15.0), "A", "ok"),     // range violation
      (3L, None, "B", "ok"),           // null violation; B not accepted
      (1L, Some(3.0), "A", "BAD1"),    // duplicate id; regex violation
      (4L, Some(7.0), null, "ok")      // null category: skipped by accepted
    ).toDF("id", "v", "cat", "s")
    val dim = Seq(1L, 2L, 3L).toDF("k") // 4 missing from dim
    val out = Expectations.check(df, Seq(
      NotNull("v"),
      InRange("v", 0.0, 10.0),
      AcceptedValues("cat", Seq("A")),
      MatchesRegex("s", "^[a-z]+$"),
      Unique(Seq("id")),
      ReferentialIn("id", dim, "k")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out("not_null") == ((5L, 1L, false)))
    assert(out("in_range[0.0,10.0]") == ((4L, 1L, false)))
    assert(out("accepted_values[A]") == ((4L, 1L, false)))
    assert(out("matches_regex[^[a-z]+$]") == ((5L, 1L, false)))
    assert(out("unique") == ((5L, 1L, false)))
    assert(out("referential_in[k]") == ((5L, 1L, false)))
  }

  test("expectations: clean data passes everything; empty data passes row checks") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val out = Expectations.check(df, Seq(
      NotNull("v"), InRange("v", 0.0, 10.0), Unique(Seq("id"))))
      .collect()
    assert(out.forall(_.getBoolean(4)))
    assert(out.map(_.getLong(3)).forall(_ == 0L))
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val eo = Expectations.check(empty, Seq(
      NotNull("v"), Unique(Seq("id"))))
      .collect()
    assert(eo.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getBoolean(4)))
  }

  test("expectations: result order follows declaration order columns") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val out = Expectations.check(df, Seq(NotNull("id"), NotNull("v")))
    assert(out.columns.toSeq ==
      Seq("expectation", "column", "n_checked", "n_violations", "pass"))
    assert(out.select("column").collect().map(_.getString(0)).toSeq ==
      Seq("id", "v"))
  }

  test("expectations: same-rendered-name checks do not collide (keyed by index)") {
    // AcceptedValues(c, Seq("a|b")) and AcceptedValues(c, Seq("a", "b"))
    // render to the same label but are semantically different — each
    // must report its OWN counts (ADVICE r16).
    val df = Seq("a", "b", "a|b", "z").toDF("cat")
    val out = Expectations.check(df, Seq(
      AcceptedValues("cat", Seq("a|b")),   // only the literal "a|b" passes
      AcceptedValues("cat", Seq("a", "b")) // "a" and "b" pass
    )).collect()
    assert(out.length == 2)
    // declaration order is preserved, so row 0 is the single-literal check
    assert(out(0).getLong(3) == 3L, s"Seq(a|b) should see 3 violations: ${out.toSeq}")
    assert(out(1).getLong(3) == 2L, s"Seq(a,b) should see 2 violations: ${out.toSeq}")
  }
}
