package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

/** Drift detectors: PSI quantile-bin semantics and JS divergence
  * identities (zero on identical, ln 2 on disjoint, symmetry).
  */
class DriftSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("psi is ~0 when current equals reference") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val row = Drift.psi(df, df, col("x"), nBins = 10).head()
    assert(math.abs(row.getDouble(0)) < 1e-12)
    assert(!row.getBoolean(1)) // not drifted
    assert(row.getLong(2) == 1000L && row.getLong(3) == 1000L)
  }

  test("psi flags a shifted distribution") {
    val ref = (1 to 1000).map(_.toDouble).toDF("x")
    val cur = (1 to 1000).map(i => i.toDouble + 700.0).toDF("x")
    val row = Drift.psi(ref, cur, col("x"), nBins = 10).head()
    assert(row.getDouble(0) > 0.25)
    assert(row.getBoolean(1))
  }

  test("psiBins emits every bin including zero-count ones") {
    val ref = (1 to 100).map(_.toDouble).toDF("x")
    val cur = Seq(1.0, 2.0).toDF("x") // all current mass in bin 0
    val bins = Drift.psiBins(ref, cur, col("x"), nBins = 5)
      .orderBy("bin").collect()
    assert(bins.length == 5)
    assert(bins.map(_.getLong(0)).toSeq == (0L until 5L))
    // reference mass ~uniform across bins; current only in bin 0
    assert(bins.head.getLong(2) == 2L)
    assert(bins.tail.forall(_.getLong(2) == 0L))
    // zero-count current bins still carry a finite negative term
    assert(bins.tail.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
  }

  test("psiBins on an empty reference returns an empty typed frame") {
    val empty = Seq.empty[Double].toDF("x")
    val cur = Seq(1.0).toDF("x")
    val out = Drift.psiBins(empty, cur, col("x"), nBins = 5)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term"))
  }

  test("js divergence is 0 for identical distributions and ln2 for disjoint") {
    val a = Seq("x", "x", "y", "z").toDF("k")
    val same = Drift.jsDivergence(a, a, col("k")).head()
    assert(math.abs(same.getDouble(0)) < 1e-12)
    assert(same.getLong(3) == 0L) // no one-sided values
    val b = Seq("p", "q").toDF("k")
    val disj = Drift.jsDivergence(a, b, col("k")).head()
    assert(math.abs(disj.getDouble(0) - math.log(2.0)) < 1e-12)
    assert(math.abs(disj.getDouble(1) - 1.0) < 1e-12) // normalized = 1
    assert(disj.getLong(3) == 5L)                     // all values one-sided
  }

  test("js divergence is symmetric") {
    val a = Seq("x", "x", "x", "y").toDF("k")
    val b = Seq("x", "y", "y", "z").toDF("k")
    val ab = Drift.jsDivergence(a, b, col("k")).head().getDouble(0)
    val ba = Drift.jsDivergence(b, a, col("k")).head().getDouble(0)
    assert(math.abs(ab - ba) < 1e-12)
    assert(ab > 0.0 && ab < math.log(2.0))
  }

  test("ks statistic: 0 on identical, 1 on disjoint, flags a shift") {
    val a = (1 to 500).map(_.toDouble).toDF("x")
    val same = Drift.ksStatistic(a, a, col("x")).head()
    assert(same.getDouble(0) == 0.0)
    assert(!same.getBoolean(4))
    val b = (1001 to 1500).map(_.toDouble).toDF("x")
    val disj = Drift.ksStatistic(a, b, col("x")).head()
    assert(disj.getDouble(0) == 1.0)
    assert(disj.getBoolean(4))
    // moderate shift: D = 0.2, crit ≈ 1.358·sqrt(2/500) ≈ 0.086
    val shifted = (101 to 600).map(_.toDouble).toDF("x")
    val row = Drift.ksStatistic(a, shifted, col("x")).head()
    assert(math.abs(row.getDouble(0) - 0.2) < 1e-12)
    assert(row.getBoolean(4))
  }

  test("chi-squared drift: ~0 on identical counts, flags a category shift") {
    val a = (Seq.fill(100)("x") ++ Seq.fill(100)("y") ++ Seq.fill(100)("z")).toDF("k")
    val same = Drift.chiSquaredDrift(a, a, col("k")).head()
    assert(math.abs(same.getDouble(0)) < 1e-12)
    assert(same.getLong(1) == 2L) // dof = K - 1
    assert(!same.getBoolean(3))
    // b: mass moved from x to y — plainly inhomogeneous
    val b = (Seq.fill(10)("x") ++ Seq.fill(190)("y") ++ Seq.fill(100)("z")).toDF("k")
    val moved = Drift.chiSquaredDrift(a, b, col("k")).head()
    assert(moved.getDouble(0) > moved.getDouble(2)) // chi2 > crit
    assert(moved.getBoolean(3))
  }

  test("chi-squared drift: empty side or single-value support emits no row") {
    val a = Seq("x", "x").toDF("k")
    assert(Drift.chiSquaredDrift(a, Seq.empty[String].toDF("k"), col("k")).count() == 0)
    // identical single-category sides: dof would be 0
    assert(Drift.chiSquaredDrift(a, a, col("k")).count() == 0)
  }

  test("profile drift reports null-rate, cardinality, and mean deltas per column") {
    val ref = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, Some(30.0), "c"), (4L, None, "d"))
      .toDF("id", "v", "s")
    val cur = Seq((5L, Some(60.0), "a"), (6L, None, "a"),
      (7L, None, "a"), (8L, None, "a"))
      .toDF("id", "v", "s")
    val got = Drift.profileDrift(ref, cur, Seq("v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = got("v")
    assert(v.getAs[Long]("n_ref") == 4L && v.getAs[Long]("n_cur") == 4L)
    assert(math.abs(v.getAs[Double]("null_rate_ref") - 0.25) < 1e-12)
    assert(math.abs(v.getAs[Double]("null_rate_cur") - 0.75) < 1e-12)
    assert(math.abs(v.getAs[Double]("null_rate_delta") - 0.5) < 1e-12)
    assert(math.abs(v.getAs[Double]("mean_ref") - 20.0) < 1e-12)
    assert(math.abs(v.getAs[Double]("mean_cur") - 60.0) < 1e-12)
    assert(math.abs(v.getAs[Double]("mean_shift") - 2.0) < 1e-12)
    val s = got("s")
    assert(s.getAs[Long]("distinct_ref") == 4L && s.getAs[Long]("distinct_cur") == 1L)
    assert(math.abs(s.getAs[Double]("distinct_ratio") - 0.25) < 1e-12)
    assert(s.isNullAt(s.fieldIndex("mean_shift"))) // non-numeric column
  }

  test("embedding drift: identical snapshots cosine 1, scaled snapshot moves the norm ratio") {
    import graft.operators.Drift
    val a = Seq(Seq(1.0, 0.0, 1.0), Seq(0.0, 1.0, 1.0)).toDF("embedding")
    val same = Drift.embeddingDrift(a, a, col("embedding")).head()
    assert(math.abs(same.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(same.getDouble(1) - 1.0) < 1e-12)
    // current = reference scaled 2x: same direction, norm ratio 2
    val b = Seq(Seq(2.0, 0.0, 2.0), Seq(0.0, 2.0, 2.0)).toDF("embedding")
    val scaled = Drift.embeddingDrift(a, b, col("embedding")).head()
    assert(math.abs(scaled.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(scaled.getDouble(1) - 2.0) < 1e-12)
    // orthogonal mean directions: cosine 0
    val c = Seq(Seq(0.0, 0.0, 1.0)).toDF("embedding")
    val d = Seq(Seq(1.0, 0.0, 0.0)).toDF("embedding")
    assert(math.abs(Drift.embeddingDrift(c, d, col("embedding"))
      .head().getDouble(0)) < 1e-12)
    // empty side: no row
    val empty = Seq.empty[Seq[Double]].toDF("embedding")
    assert(Drift.embeddingDrift(a, empty, col("embedding")).count() == 0)
  }

  test("token js divergence detects vocabulary drift") {
    val a = Seq("the quick fox", "the lazy dog").toDF("text")
    val sameCorpus = Drift.tokenJsDivergence(a, a, col("text")).head()
    assert(math.abs(sameCorpus.getDouble(0)) < 1e-12)
    val b = Seq("completely different words here").toDF("text")
    val drifted = Drift.tokenJsDivergence(a, b, col("text")).head()
    assert(math.abs(drifted.getDouble(1) - 1.0) < 1e-12) // disjoint vocab
  }

  test("wasserstein1: pure shift reads exactly delta; identical → 0; W1 >= |Δmean|") {
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
    val shifted = Seq(3.5, 4.5, 5.5, 6.5, 7.5).toDF("x") // +2.5 shift
    val r = Drift.wasserstein1(a, shifted, col("x")).head()
    assert(math.abs(r.getDouble(0) - 2.5) < 1e-12,
      s"W1 of a pure +2.5 shift must be 2.5, got ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 2.5) < 1e-12) // mean_shift rides along
    assert(r.getLong(2) == 5L && r.getLong(3) == 5L)
    // identical distributions (different row multiplicity): 0
    val a2 = Seq(1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0, 5.0, 5.0).toDF("x")
    assert(math.abs(Drift.wasserstein1(a, a2, col("x")).head().getDouble(0))
      < 1e-12)
    // shape change with equal means: W1 > 0 = mean_shift 0, and the
    // invariant W1 >= |Δmean| holds
    val spread = Seq(-2.0, 1.0, 3.0, 5.0, 8.0).toDF("x") // mean 3, same as a
    val s = Drift.wasserstein1(a, spread, col("x")).head()
    assert(s.getDouble(0) > 0 && math.abs(s.getDouble(1)) < 1e-12)
    assert(s.getDouble(0) >= s.getDouble(1))
    // hand value: merged support {-2,1,2,3,4,5,8}; Fa={0,.2,.4,.6,.8,1,1},
    // Fb={.2,.4,.4,.6,.6,.8,1}; Σ|ΔF|·gap = .2·3+.2·1+0+0+.2·1+.2·3 = 1.6
    assert(math.abs(s.getDouble(0) - 1.6) < 1e-12)
    // empty side: no row
    assert(Drift.wasserstein1(a, Seq.empty[Double].toDF("x"), col("x"))
      .count() == 0)
    // two constant columns (single-point merged support): W1 is 0.0,
    // not null — the no-gap-terms edge
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val cc = Drift.wasserstein1(const, const, col("x")).head()
    assert(!cc.isNullAt(0) && cc.getDouble(0) == 0.0)
  }

  test("driftMatrix: per-feature rows match the single-column operators exactly") {
    // deterministic two-feature fixture with real drift in f2
    val ref = (1 to 400).map(i =>
      ((i % 20).toDouble, (i % 7).toDouble)).toDF("f1", "f2")
    val cur = (1 to 300).map(i =>
      ((i % 20).toDouble, (i % 7).toDouble + (if (i % 3 == 0) 2.0 else 0.0)))
      .toDF("f1", "f2")
    val m = Drift.driftMatrix(ref, cur, Seq("f1", "f2"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(m.keySet == Set("f1", "f2"))
    for (f <- Seq("f1", "f2")) {
      val row = m(f)
      val psi = Drift.psi(ref, cur, col(f), threshold = 1e9).head().getDouble(0)
      val ks = Drift.ksStatistic(ref, cur, col(f)).head()
      val w1 = Drift.wasserstein1(ref, cur, col(f)).head()
      val js = Drift.jsDivergence(ref, cur, col(f)).head()
      val chi = Drift.chiSquaredDrift(ref, cur, col(f)).head()
      assert(math.abs(row.getAs[Double]("psi") - psi) < 1e-12, s"$f psi")
      assert(math.abs(row.getAs[Double]("ks_d") - ks.getDouble(0)) < 1e-12, s"$f ks")
      assert(math.abs(row.getAs[Double]("w1") - w1.getDouble(0)) < 1e-12, s"$f w1")
      assert(math.abs(row.getAs[Double]("mean_shift") - w1.getDouble(1)) < 1e-12)
      assert(math.abs(row.getAs[Double]("js_nats") - js.getDouble(0)) < 1e-12, s"$f js")
      assert(math.abs(row.getAs[Double]("chi2") - chi.getDouble(0)) < 1e-9, s"$f chi2")
      assert(row.getAs[Long]("dof") == chi.getLong(1), s"$f dof")
      assert(row.getAs[Long]("n_ref") == 400L && row.getAs[Long]("n_cur") == 300L)
    }
    // f2 drifted harder than f1 on every distribution metric
    assert(m("f2").getAs[Double]("psi") > m("f1").getAs[Double]("psi"))
    assert(m("f2").getAs[Double]("ks_d") > m("f1").getAs[Double]("ks_d"))
    // slices: keyed matrix emits one row per (slice, feature)
    val refS = ref.withColumn("g", (col("f1") < 10).cast("string"))
    val curS = cur.withColumn("g", (col("f1") < 10).cast("string"))
    val sliced = Drift.driftMatrix(refS, curS, Seq("f1", "f2"),
      slice = Some(col("g")))
    assert(sliced.count() == 4)
    // a feature empty on one side (within the matrix) emits no row
    val curNull = cur.withColumn("f2", lit(null).cast("double"))
    val part = Drift.driftMatrix(ref, curNull, Seq("f1", "f2"))
    assert(part.select("feature").collect().map(_.getString(0)).toSet == Set("f1"))
    // a non-numeric feature is an ERROR, not a silent drop
    val refStr = ref.withColumn("cat", concat(lit("c"), col("f1").cast("int")))
    val curStr = cur.withColumn("cat", concat(lit("c"), col("f1").cast("int")))
    val e = intercept[IllegalArgumentException] {
      Drift.driftMatrix(refStr, curStr, Seq("f1", "cat"))
    }
    assert(e.getMessage.contains("numeric required"))
  }

  test("driftMatrixCategorical: rows match jsDivergence and chiSquaredDrift exactly") {
    val ref = (1 to 300).map(i => ("c" + (i % 5), "d" + (i % 3)))
      .toDF("cat1", "cat2")
    val cur = (1 to 200).map(i =>
      ("c" + (if (i % 4 == 0) 7 else i % 5), "d" + (i % 3)))
      .toDF("cat1", "cat2")
    val m = Drift.driftMatrixCategorical(ref, cur, Seq("cat1", "cat2"))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(m.keySet == Set("cat1", "cat2"))
    for (f <- Seq("cat1", "cat2")) {
      val js = Drift.jsDivergence(ref, cur, col(f)).head()
      val chi = Drift.chiSquaredDrift(ref, cur, col(f)).head()
      assert(math.abs(m(f).getAs[Double]("js_nats") - js.getDouble(0)) < 1e-12)
      assert(math.abs(m(f).getAs[Double]("chi2") - chi.getDouble(0)) < 1e-9)
      assert(m(f).getAs[Long]("dof") == chi.getLong(1))
      assert(m(f).getAs[Long]("n_ref") == 300L && m(f).getAs[Long]("n_cur") == 200L)
    }
    // cat1 gained a one-sided category: every metric reads drift; cat2 iid
    assert(m("cat1").getAs[Double]("psi") > m("cat2").getAs[Double]("psi"))
    assert(m("cat1").getAs[Double]("js_nats") > m("cat2").getAs[Double]("js_nats"))
  }
}
