package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Golden semantics for the profiling operators on tiny inline fixtures
  * where every expected row is hand-checkable.
  */
class ProfilingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("histogram: equi-width bins, max lands in last bin, empty bins emitted, nulls ignored") {
    val df = Seq(Some(0.0), Some(1.0), Some(9.9), Some(10.0), None)
      .toDF("x")
    val got = Profiling.histogram(df, col("x"), 5)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSeq
    // range [0,10], width 2: bin0=[0,2): {0.0, 1.0}; bin4=[8,10]: {9.9, 10.0}
    assert(got == Seq(
      (0L, 0.0, 2.0, 2L), (1L, 2.0, 4.0, 0L), (2L, 4.0, 6.0, 0L),
      (3L, 6.0, 8.0, 0L), (4L, 8.0, 10.0, 2L)))
  }

  test("histogram: single-value column collapses to bin 0") {
    val df = Seq(7.0, 7.0, 7.0).toDF("x")
    val got = Profiling.histogram(df, col("x"), 4).orderBy("bin")
      .select("bin", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("profileTable: counts, nulls, distincts; numeric stats only for numeric columns") {
    val df = Seq((1L, Some(2.0), "a"), (2L, None, "b"), (3L, Some(4.0), "a"))
      .toDF("id", "v", "s")
    val got = Profiling.profileTable(df, Seq("id", "v", "s"))
      .orderBy("column").collect()
    val byCol = got.map(r => r.getString(0) -> r).toMap
    assert(byCol("id").getLong(1) == 3 && byCol("id").getLong(2) == 0 &&
      byCol("id").getLong(3) == 3 && byCol("id").getDouble(4) == 1.0 &&
      byCol("id").getDouble(5) == 3.0 && byCol("id").getDouble(6) == 2.0)
    assert(byCol("v").getLong(2) == 1 && byCol("v").getLong(3) == 2 &&
      byCol("v").getDouble(6) == 3.0) // mean over non-null {2,4}
    assert(byCol("s").getLong(3) == 2 && byCol("s").isNullAt(4) &&
      byCol("s").isNullAt(5) && byCol("s").isNullAt(6))
  }

  test("profileTable/validate: hostile column and check names (quotes, dots, spaces, backticks) are data, not SQL") {
    val df = Seq((1L, "a"), (2L, "b"))
      .toDF("weird.name", "it's a `col`")
    val got = Profiling.profileTable(df, Seq("weird.name", "it's a `col`"))
      .orderBy("column").collect()
    assert(got.length == 2)
    assert(got.map(_.getString(0)).toSet == Set("weird.name", "it's a `col`"))
    assert(got.forall(_.getLong(1) == 2)) // n_rows survives the odd names
    val checks = Profiling.validate(df, Seq(
      "name with 'quotes' and `ticks`" ->
        Profiling.notNullViolations(col("`weird.name`")))).collect()
    assert(checks.length == 1 &&
      checks.head.getString(0) == "name with 'quotes' and `ticks`" &&
      checks.head.getBoolean(2))
  }

  test("mutualInfo: zero for independent columns, ln(2) for two perfectly-coupled fair bits") {
    val indep = (for (a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val mi0 = Profiling.mutualInfo(indep, col("a"), col("b")).head()
    assert(math.abs(mi0.getDouble(0)) < 1e-12)
    assert(mi0.getLong(1) == 20 && mi0.getLong(2) == 4)

    val coupled = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val mi1 = Profiling.mutualInfo(coupled, col("a"), col("b")).head()
    assert(math.abs(mi1.getDouble(0) - math.log(2.0)) < 1e-12)
  }

  test("mutualInfo: null rows excluded from the joint support") {
    val df = Seq((Some("x"), Some("p")), (Some("x"), None), (None, Some("p")))
      .toDF("a", "b")
    val r = Profiling.mutualInfo(df, col("a"), col("b")).head()
    assert(r.getLong(1) == 1 && r.getLong(2) == 1)
  }

  test("rankNormalize: empirical quantiles 0..1 under (x, tie) order; N=1 gives 0.5") {
    import graft.operators.Relational
    val df = Seq((1L, 30.0), (2L, 10.0), (3L, 20.0), (4L, 40.0), (5L, 20.0))
      .toDF("id", "x")
    val got = Relational.rankNormalize(df, col("x"), Seq(col("id")))
      .orderBy("id").collect().map(r => r.getDouble(2)).toSeq
    // order: 10(id2) 20(id3) 20(id5) 30(id1) 40(id4) → q = rn-1 / 4
    assert(got == Seq(0.75, 0.0, 0.25, 1.0, 0.5))
    val one = Relational.rankNormalize(Seq((1L, 5.0)).toDF("id", "x"),
      col("x"), Seq(col("id")))
    assert(one.head().getDouble(2) == 0.5)
  }

  test("entropy: uniform hits ln(k) and norm 1; constant column is 0; nulls excluded") {
    val uniform = Seq("a", "b", "c", "a", "b", "c").toDF("x")
    val u = Profiling.entropy(uniform, col("x")).head()
    assert(math.abs(u.getDouble(0) - math.log(3.0)) < 1e-12)
    assert(math.abs(u.getDouble(1) - 1.0) < 1e-12)
    val const = Seq(Some("a"), Some("a"), None).toDF("x")
    val c = Profiling.entropy(const, col("x")).head()
    assert(c.getDouble(0) == 0.0 && c.getDouble(1) == 0.0)
    assert(c.getLong(2) == 1 && c.getLong(3) == 2) // null row excluded
  }

  test("robustScale: median/IQR scaling ignores the outlier a z-score would absorb") {
    import graft.operators.Relational
    // group g: {0,10,20,30,40} → med 20, IQR 30-10=20; an added outlier
    // shifts mean/std wildly but med→20, IQR→(35-15)=20 stays put on the
    // original 5 ranks? Keep it simple: check exact scaling on the clean
    // group and the zero-IQR guard on the degenerate one.
    val df = Seq(("g", 0.0), ("g", 10.0), ("g", 20.0), ("g", 30.0),
      ("g", 40.0), ("h", 7.0), ("h", 7.0)).toDF("k", "x")
    val got = Relational.robustScale(df, col("k"), col("x"))
      .orderBy("k", "x").collect()
    val gRows = got.filter(_.getString(0) == "g").map(_.getDouble(2))
    assert(gRows.toSeq == Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
    assert(got.filter(_.getString(0) == "h")
      .forall(_.isNullAt(2))) // IQR=0 → null, not a divide
  }

  test("validate: one pass, per-check violation counts, clean checks pass") {
    val df = Seq(
      (Some(1L), Some(5.0), Some("a")),
      (Some(1L), Some(50.0), Some("b")),  // dup id
      (None, Some(-1.0), Some("zzz")),    // null id, below range, bad value
      (Some(3L), None, None))             // nulls don't violate range/set
      .toDF("id", "v", "s")
    val got = Profiling.validate(df, Seq(
        "id_not_null" -> Profiling.notNullViolations(col("id")),
        "id_unique" -> Profiling.uniqueViolations(col("id")),
        "v_range" -> Profiling.rangeViolations(col("v"), 0.0, 100.0),
        "s_set" -> Profiling.inSetViolations(col("s"), Seq("a", "b"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got("id_not_null") == (1L, false))
    assert(got("id_unique") == (1L, false))   // {1,1,3}: 3 non-null, 2 distinct
    assert(got("v_range") == (1L, false))
    assert(got("s_set") == (1L, false))
    val clean = Profiling.validate(df.filter(col("id").isNotNull), Seq(
      "id_not_null" -> Profiling.notNullViolations(col("id"))))
      .head()
    assert(clean.getLong(1) == 0 && clean.getBoolean(2))
  }

  test("cumulativeShare: descending rank, exact shares, smallest prefix covering the threshold") {
    import graft.operators.Relational
    // totals: a=50, b=30, c=15, d=5 (grand 100). Head at 0.8: a (0<0.8),
    // b (0.5<0.8), c (0.8 NOT < 0.8 → excluded... wait: share BEFORE c
    // is 0.8 exactly, so c is out; head = {a, b} covers exactly 80%.
    val df = Seq(("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0))
      .toDF("k", "v")
    val got = Relational.cumulativeShare(df, col("k"), col("v"), 0.8)
      .orderBy(col("cum_share"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(("a", 50.0, 0.5, true), ("b", 30.0, 0.8, true),
      ("c", 15.0, 0.95, false), ("d", 5.0, 1.0, false)))
  }

  test("cumulativeShare: the crossing key is included when the threshold lands mid-key") {
    import graft.operators.Relational
    val df = Seq(("a", 60.0), ("b", 30.0), ("c", 10.0)).toDF("k", "v")
    val got = Relational.cumulativeShare(df, col("k"), col("v"), 0.8)
      .orderBy(col("cum_share"))
      .collect().map(r => (r.getString(0), r.getBoolean(3))).toSeq
    // before-b share is 0.6 < 0.8 → b (which crosses to 0.9) is IN
    assert(got == Seq(("a", true), ("b", true), ("c", false)))
  }

  test("keySkew: one-row summary; a dominant key shows in max and top_share") {
    val df = (Seq.fill(8)("hot") ++ Seq("a", "b")).toDF("k")
    val r = Profiling.keySkew(df, col("k")).head()
    assert(r.getLong(r.fieldIndex("n_keys")) == 3)
    assert(r.getLong(r.fieldIndex("n_rows")) == 10)
    assert(r.getLong(r.fieldIndex("max_n")) == 8)
    assert(r.getDouble(r.fieldIndex("top_share")) == 0.8)
    assert(r.getDouble(r.fieldIndex("p50_n")) == 1.0) // sizes {8,1,1}
  }
}
