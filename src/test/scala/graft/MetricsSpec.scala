package graft

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.Metrics
import graft.sources.Tables

/** §2.4 A7: the corr-aggregate matrix (the plan q_corr_matrix runs) must
  * agree with MLlib's `ml.stat.Correlation` — the independent
  * implementation — to float tolerance. Pins the round-2 rewrite that
  * replaced the RowMatrix path with one hash-agg pass.
  */
class MetricsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("A7: corrMatrix (aggregate path) matches ml.stat.Correlation (MLlib path)") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001").select(cols.map(col): _*)

    val aggRows = Metrics.corrMatrix(li, cols).collect()
    val aggM = aggRows.map(r => r.getString(0) ->
      cols.map(c => r.getAs[Double](c)).toArray).toMap

    val assembled = new VectorAssembler().setInputCols(cols.toArray)
      .setOutputCol("features").transform(li)
    val mllibM = Correlation.corr(assembled, "features", "pearson")
      .head().getAs[org.apache.spark.ml.linalg.Matrix](0)

    for (i <- cols.indices; j <- cols.indices) {
      val a = aggM(cols(i))(j)
      val m = mllibM(i, j)
      assert(math.abs(a - m) < 1e-9,
        s"corr(${cols(i)}, ${cols(j)}): agg=$a mllib=$m")
    }
  }

  test("welchTTest matches a plain-Scala Welch computation on a hand fixture") {
    import spark.implicits._
    val a = Seq(10.0, 12.0, 11.0, 13.0, 9.0)
    val b = Seq(20.0, 25.0, 15.0)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "x")
    val r = Metrics.welchTTest(df, col("g"), col("x"), "A", "B").head()
    def meanOf(xs: Seq[Double]) = xs.sum / xs.size
    def varOf(xs: Seq[Double]) = {
      val m = meanOf(xs); xs.map(v => (v - m) * (v - m)).sum / (xs.size - 1)
    }
    val (sa, sb) = (varOf(a) / a.size, varOf(b) / b.size)
    val tWant = (meanOf(a) - meanOf(b)) / math.sqrt(sa + sb)
    val dfWant = math.pow(sa + sb, 2) /
      (sa * sa / (a.size - 1) + sb * sb / (b.size - 1))
    assert(r.getLong(0) == 5 && r.getLong(2) == 3)
    assert(math.abs(r.getDouble(4) - tWant) < 1e-12)
    assert(math.abs(r.getDouble(5) - dfWant) < 1e-12)
  }

  test("aucExact: perfect separation 1.0, reversed 0.0, all-ties 0.5, mid case hand-checked") {
    import spark.implicits._
    def auc(rows: Seq[(Boolean, Double)]): Double =
      Metrics.aucExact(rows.toDF("y", "s"), col("y"), col("s"))
        .head().getDouble(0)
    assert(auc(Seq((true, 3.0), (true, 2.0), (false, 1.0), (false, 0.5))) == 1.0)
    assert(auc(Seq((false, 3.0), (false, 2.0), (true, 1.0), (true, 0.5))) == 0.0)
    assert(auc(Seq((true, 1.0), (false, 1.0), (true, 1.0), (false, 1.0))) == 0.5)
    // pairs: pos{2,1} neg{1.5,1}: (2>1.5)+(2>1)+(1<1.5=0)+(1==1→0.5) = 2.5/4
    assert(auc(Seq((true, 2.0), (false, 1.5), (true, 1.0), (false, 1.0))) == 0.625)
  }

  test("targetEncodeLoo: LOO excludes the row, singleton category hits the prior exactly") {
    import spark.implicits._
    import graft.ml.Featurize
    // cat A: y = {10, 20}; cat B: y = {40}; prior = 70/3
    val df = Seq(("A", 10.0, 1L), ("A", 20.0, 2L), ("B", 40.0, 3L))
      .toDF("c", "y", "id")
    val got = Featurize.targetEncodeLoo(df, col("c"), col("y"), m = 2.0)
      .orderBy("id").collect().map(_.getAs[Double]("y_enc")).toSeq
    val prior = 70.0 / 3
    // row1: (30-10+2·prior)/(2-1+2); row3 (singleton): (40-40+2·prior)/2 = prior
    assert(math.abs(got(0) - (20 + 2 * prior) / 3) < 1e-12)
    assert(math.abs(got(1) - (10 + 2 * prior) / 3) < 1e-12)
    assert(math.abs(got(2) - prior) < 1e-12)
  }

  test("calibrationReport: hand-computed bins, brier, ece; rejects out-of-domain scores") {
    import spark.implicits._
    // in-domain rows: bins 0 {0.05→0}, 1 {0.15→0, 0.15→1}, 9 {0.95→1, 1.0→1}
    // (score exactly 1.0 must clamp into the top bin, not bin 10);
    // the 1.5 and null scores are out-of-domain and must not appear.
    val df = Seq(
      (Some(0.05), 0), (Some(0.15), 0), (Some(0.15), 1),
      (Some(0.95), 1), (Some(1.0), 1), (Some(1.5), 1),
      (Option.empty[Double], 0)).toDF("s", "y")
    val r = Metrics.calibrationReport(df, col("y"), col("s"), 10)
      .orderBy("bin").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 9L))
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 2L))
    val mean = r.map(_.getDouble(2))
    val frac = r.map(_.getDouble(3))
    assert(math.abs(mean(0) - 0.05) < 1e-12 && math.abs(frac(0) - 0.0) < 1e-12)
    assert(math.abs(mean(1) - 0.15) < 1e-12 && math.abs(frac(1) - 0.5) < 1e-12)
    assert(math.abs(mean(2) - 0.975) < 1e-12 && math.abs(frac(2) - 1.0) < 1e-12)
    // brier over the 5 admitted rows:
    // (.05² + .15² + .85² + .05² + 0²)/5 = 0.75/5 = 0.15
    assert(math.abs(r.head.getDouble(4) - 0.15) < 1e-12)
    // ece = (1/5)|0−.05| + (2/5)|.5−.15| + (2/5)|1−.975| = .01+.14+.01 = .16
    assert(math.abs(r.head.getDouble(5) - 0.16) < 1e-12)
  }

  test("cohenKappa: Cohen's worked 50-item table gives κ=0.4; exact marginals") {
    import spark.implicits._
    // 20 both-yes, 15 both-no, 5 A-yes/B-no, 10 A-no/B-yes:
    // po = 35/50 = 0.7; pA(yes)=0.5, pB(yes)=0.6 → pe = 0.5·0.6+0.5·0.4 = 0.5
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes"))
    val r = Metrics.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(r.getLong(0) == 50L && r.getLong(1) == 35L)
    assert(math.abs(r.getDouble(2) - 0.7) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.4) < 1e-12)
  }

  test("cohenKappa: one-sided categories contribute zero to pe; degenerate pe=1 → null") {
    import spark.implicits._
    // categories b (A only) and c (B only) have zero cross-marginal mass:
    // pe = 1·1/4 = 0.25, po = 0.5 → κ = 1/3
    val r = Metrics.cohenKappa(Seq(("a", "a"), ("b", "c")).toDF("a", "b"),
      col("a"), col("b")).head()
    assert(math.abs(r.getDouble(3) - 0.25) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.0 / 3) < 1e-12)
    // both raters constant and identical: chance explains everything
    val d = Metrics.cohenKappa(Seq(("x", "x"), ("x", "x")).toDF("a", "b"),
      col("a"), col("b")).head()
    assert(d.getDouble(2) == 1.0 && d.getDouble(3) == 1.0 && d.isNullAt(4))
    // null ratings are excluded, not counted as disagreement
    val n = Metrics.cohenKappa(
      Seq(("a", Some("a")), ("b", Option.empty[String])).toDF("a", "b"),
      col("a"), col("b")).head()
    assert(n.getLong(0) == 1L && n.getLong(1) == 1L)
  }

  test("classificationReport: hand-computed per-class P/R/F1, phantom class, macro-F1") {
    import spark.implicits._
    // cells: (cat,cat)×3 (cat,dog)×1 (dog,dog)×2 (dog,cat)×2 (bird,ghost)×2
    val rows = Seq.fill(3)(("cat", "cat")) ++ Seq(("cat", "dog")) ++
      Seq.fill(2)(("dog", "dog")) ++ Seq.fill(2)(("dog", "cat")) ++
      Seq.fill(2)(("bird", "ghost"))
    val got = Metrics.classificationReport(rows.toDF("y", "p"), col("y"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("bird", "cat", "dog", "ghost"))
    val cat = got("cat")
    assert(cat.getLong(1) == 4L && cat.getLong(2) == 3L)
    assert(math.abs(cat.getDouble(3) - 0.6) < 1e-12)   // precision 3/5
    assert(math.abs(cat.getDouble(4) - 0.75) < 1e-12)  // recall 3/4
    assert(math.abs(cat.getDouble(5) - 2.0 / 3) < 1e-12)
    val dog = got("dog")
    assert(math.abs(dog.getDouble(3) - 2.0 / 3) < 1e-12)
    assert(math.abs(dog.getDouble(4) - 0.5) < 1e-12)
    assert(math.abs(dog.getDouble(5) - 4.0 / 7) < 1e-12)
    // bird is never predicted: precision undefined (null), recall 0, f1 null
    val bird = got("bird")
    assert(bird.getLong(1) == 2L && bird.isNullAt(3))
    assert(bird.getDouble(4) == 0.0 && bird.isNullAt(5))
    // ghost is predicted but never true: support 0, precision 0, recall null
    val ghost = got("ghost")
    assert(ghost.getLong(1) == 0L && ghost.getDouble(3) == 0.0 && ghost.isNullAt(4))
    // accuracy 5/10 on every row; macro-F1 counts bird/ghost's undefined
    // f1 as 0.0 (sklearn zero_division=0): (2/3 + 4/7 + 0 + 0)/4
    assert(math.abs(cat.getDouble(6) - 0.5) < 1e-12)
    assert(math.abs(cat.getDouble(7) - 13.0 / 42) < 1e-12)
  }

  test("weightedKappa: quadratic and linear hand fixtures; constant raters → null") {
    import spark.implicits._
    // cells (0,0)×2 (1,1)×2 (2,2)×2 (0,2)×1 (2,0)×1:
    // quadratic D_obs = 8/8 = 1, D_exp = 96/64 = 1.5 → κw = 1/3
    val rows = Seq.fill(2)((0, 0)) ++ Seq.fill(2)((1, 1)) ++
      Seq.fill(2)((2, 2)) ++ Seq((0, 2), (2, 0))
    val q = Metrics.weightedKappa(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(q.getLong(0) == 8L)
    assert(math.abs(q.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(q.getDouble(2) - 1.5) < 1e-12)
    assert(math.abs(q.getDouble(3) - 1.0 / 3) < 1e-12)
    // linear: D_obs = 4/8 = 0.5, D_exp = 60/64 → κw = 1 − 32/60
    val l = Metrics.weightedKappa(rows.toDF("a", "b"), col("a"), col("b"),
      quadratic = false).head()
    assert(math.abs(l.getDouble(1) - 0.5) < 1e-12)
    assert(math.abs(l.getDouble(2) - 60.0 / 64) < 1e-12)
    assert(math.abs(l.getDouble(3) - (1.0 - 32.0 / 60)) < 1e-12)
    // both raters constant: D_exp = 0, chance explains everything → null
    val d = Metrics.weightedKappa(Seq((1, 1), (1, 1)).toDF("a", "b"),
      col("a"), col("b")).head()
    assert(d.isNullAt(3))
  }

  test("krippendorffAlpha: hand fixtures nominal vs interval; single-rating units excluded; degenerate → null") {
    import spark.implicits._
    // units A:[1,2] B:[3,3] C:[1,1], plus D:[2] which MUST be excluded
    // (no pairable information). Hand computation over pairable ratings
    // (n = 6): nominal D_obs = 2/6, marginals n1=3 n2=1 n3=2 →
    // D_exp = (36−14)/30 = 22/30 → α = 1 − (1/3)/(11/15) = 6/11.
    // interval D_obs = 2(2·5−9)/1 / 6 = 1/3, S1=11 S2=25 →
    // D_exp = 2(6·25−121)/30 = 58/30 → α = 1 − (1/3)/(29/15) = 24/29.
    val rows = Seq(("A", 1), ("A", 2), ("B", 3), ("B", 3),
      ("C", 1), ("C", 1), ("D", 2)).toDF("u", "v")
    val nom = Metrics.krippendorffAlpha(rows, col("u"), col("v")).head()
    assert(nom.getLong(0) == 3L && nom.getLong(1) == 6L)
    assert(math.abs(nom.getDouble(2) - 1.0 / 3) < 1e-12)
    assert(math.abs(nom.getDouble(3) - 22.0 / 30) < 1e-12)
    assert(math.abs(nom.getDouble(4) - 6.0 / 11) < 1e-12)
    val itv = Metrics.krippendorffAlpha(rows, col("u"), col("v"),
      nominal = false).head()
    assert(itv.getLong(0) == 3L && itv.getLong(1) == 6L)
    assert(math.abs(itv.getDouble(2) - 1.0 / 3) < 1e-12)
    assert(math.abs(itv.getDouble(3) - 58.0 / 30) < 1e-12)
    assert(math.abs(itv.getDouble(4) - 24.0 / 29) < 1e-12)
    // binary values: nominal and interval coincide (δ = 1 either way)
    val bin = Seq(("A", 0), ("A", 1), ("B", 1), ("B", 1), ("C", 0), ("C", 0))
      .toDF("u", "v")
    val bn = Metrics.krippendorffAlpha(bin, col("u"), col("v")).head()
    val bi = Metrics.krippendorffAlpha(bin, col("u"), col("v"),
      nominal = false).head()
    assert(math.abs(bn.getDouble(4) - bi.getDouble(4)) < 1e-12)
    // all pairable ratings identical → D_exp = 0 → α null (kappa convention)
    val dg = Metrics.krippendorffAlpha(
      Seq(("A", 1), ("A", 1), ("B", 1), ("B", 1)).toDF("u", "v"),
      col("u"), col("v")).head()
    assert(dg.isNullAt(4))
  }

  test("fleissKappa: hand fixture; incomplete panels excluded; degenerate → null") {
    import spark.implicits._
    // 4 units × 3 raters, categories A/B:
    //   AAA → P = (9−3)/6 = 1;  AAB → (4+1−3)/6 = 1/3;
    //   ABB → 1/3;              BBB → 1
    // P̄ = (1 + 1/3 + 1/3 + 1)/4 = 2/3; p_A = 6/12 = p_B → P̄_e = 1/2
    // κ = (2/3 − 1/2)/(1 − 1/2) = 1/3
    val rows = Seq(
      ("u1", "A"), ("u1", "A"), ("u1", "A"),
      ("u2", "A"), ("u2", "A"), ("u2", "B"),
      ("u3", "A"), ("u3", "B"), ("u3", "B"),
      ("u4", "B"), ("u4", "B"), ("u4", "B")).toDF("u", "v")
    val r = Metrics.fleissKappa(rows, col("u"), col("v"), 3).head()
    assert(r.getLong(0) == 4L && r.getInt(1) == 3)
    assert(math.abs(r.getDouble(2) - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.0 / 3) < 1e-12)
    // a 2-rating unit is not a complete panel: excluded everywhere —
    // from n_units AND from the marginals (its B must not shift p_c)
    val withPartial = rows.union(Seq(("u5", "B"), ("u5", "B")).toDF("u", "v"))
    val p = Metrics.fleissKappa(withPartial, col("u"), col("v"), 3).head()
    assert(p.getLong(0) == 4L)
    assert(math.abs(p.getDouble(4) - 1.0 / 3) < 1e-12)
    // every rating one category → P̄_e = 1 → κ null (family convention)
    val d = Metrics.fleissKappa(
      Seq(("a", "X"), ("a", "X"), ("b", "X"), ("b", "X")).toDF("u", "v"),
      col("u"), col("v"), 2).head()
    assert(d.getDouble(2) == 1.0 && d.getDouble(3) == 1.0 && d.isNullAt(4))
  }

  test("conformalSplit: hand fixture — k-th order statistic, exact test coverage") {
    import spark.implicits._
    // calibration residuals 1..9 (y = r, yhat = 0), α = 0.2:
    // k = ⌈10·0.8⌉ = 8 → q̂ = 8; test residuals {7.5, 8, 8.5, 9} →
    // coverage = 2/4 (7.5 and 8.0 are inside; 8.5, 9 are not)
    val cal = (1 to 9).map(i => (i.toDouble, 0.0)).toDF("y", "yhat")
    val test = Seq(7.5, 8.0, 8.5, 9.0).map((_, 0.0)).toDF("y", "yhat")
    val r = Metrics.conformalSplit(cal, test, col("y"), col("yhat"), 0.2)
      .head()
    assert(r.getLong(0) == 9L && r.getLong(1) == 8L)
    assert(math.abs(r.getDouble(2) - 8.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    // α small enough that (n+1)(1−α) > n: k clamps to n, q̂ = max residual
    val c = Metrics.conformalSplit(cal, test, col("y"), col("yhat"), 0.01)
      .head()
    assert(c.getLong(1) == 9L && math.abs(c.getDouble(2) - 9.0) < 1e-9)
    // null y/yhat rows contribute to neither side
    val calN = cal.union(Seq((Double.NaN, Double.NaN)).toDF("y", "yhat")
      .selectExpr("cast(null as double) as y", "cast(null as double) as yhat"))
    val n = Metrics.conformalSplit(calN, test, col("y"), col("yhat"), 0.2)
      .head()
    assert(n.getLong(0) == 9L)
    // empty TEST side: q̂ is defined by calibration alone and must
    // survive (coverage null — undefined over zero rows) (ADVICE r15)
    val e = Metrics.conformalSplit(cal, test.limit(0), col("y"), col("yhat"), 0.2)
      .head()
    assert(!e.isNullAt(2) && math.abs(e.getDouble(2) - 8.0) < 1e-9,
      "qhat must survive an empty test set")
    assert(e.isNullAt(3), "coverage is undefined over zero test rows")
  }

  test("poissonBootstrap: deterministic hash draws; CI brackets the mean; weight law sane") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 97).toDouble)).toDF("id", "v")
    val r1 = Metrics.poissonBootstrap(df, col("v"), col("id"), b = 60).head()
    val r2 = Metrics.poissonBootstrap(df, col("v"), col("id"), b = 60).head()
    assert(r1 == r2, "hash-derived draws must be run-to-run identical")
    assert(r1.getLong(0) == 500L && r1.getInt(1) == 60)
    val est = df.agg(avg(col("v"))).head().getDouble(0)
    assert(math.abs(r1.getDouble(2) - est) < 1e-12)
    assert(r1.getDouble(3) <= r1.getDouble(2) && r1.getDouble(2) <= r1.getDouble(4),
      s"CI [${r1.getDouble(3)}, ${r1.getDouble(4)}] must bracket est ${r1.getDouble(2)}")
    // the interval is non-degenerate and of plausible width for n=500
    // (σ/√n ≈ 1.25 here; 95% CI half-width ≈ 2.5): sanity band, not exact
    val half = (r1.getDouble(4) - r1.getDouble(3)) / 2
    assert(half > 0.5 && half < 10, s"implausible CI half-width $half")
    // Poisson(1) draws: mean total weight per replicate ≈ n (LLN band)
    val rows = df.select(col("v").cast("double").as("__v"),
      col("id").cast("string").as("__id"))
    val w = Metrics.PoissonCdf60.foldLeft(lit(0)) { (acc, t) =>
      acc + (graft.functions.Hashing.h60(
        concat(lit("0:"), col("__id"))) >= lit(t)).cast("int")
    }
    val totW = rows.agg(sum(w)).head().getLong(0)
    assert(totW > 400 && totW < 600, s"replicate-0 total weight $totW far from n=500")
  }

  test("poissonBootstrap: production mixer draw agrees with the md5 replay encoding") {
    import spark.implicits._
    // pinned fixture: the two draw encodings are different hash
    // functions, so replicate means differ — but both are valid
    // Poisson(1) bootstraps of the SAME data, so their percentile CIs
    // must agree to well within the interval's own width, both must
    // bracket est, and each must be run-to-run deterministic.
    val df = (1 to 2000).map(i => (i.toLong, (i % 97).toDouble + 0.25 * (i % 13)))
      .toDF("id", "v")
    val mix = Metrics.poissonBootstrap(df, col("v"), col("id"), b = 200).head()
    val mix2 = Metrics.poissonBootstrap(df, col("v"), col("id"), b = 200).head()
    val md5 = Metrics.poissonBootstrap(df, col("v"), col("id"), b = 200,
      md5Replay = true).head()
    assert(mix == mix2, "mixer draws must be run-to-run identical")
    assert(mix.getLong(0) == md5.getLong(0) && mix.getDouble(2) == md5.getDouble(2),
      "n and est are draw-independent")
    val width = md5.getDouble(4) - md5.getDouble(3)
    assert(width > 0)
    assert(math.abs(mix.getDouble(3) - md5.getDouble(3)) < 0.5 * width,
      s"lo: mixer ${mix.getDouble(3)} vs md5 ${md5.getDouble(3)} (width $width)")
    assert(math.abs(mix.getDouble(4) - md5.getDouble(4)) < 0.5 * width,
      s"hi: mixer ${mix.getDouble(4)} vs md5 ${md5.getDouble(4)} (width $width)")
    assert(mix.getDouble(3) <= mix.getDouble(2) && mix.getDouble(2) <= mix.getDouble(4))
  }

  test("retrievalMetrics: hand-computed recall/precision/MRR/nDCG@3, rank>k excluded") {
    import spark.implicits._
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    // q1: ranks 1..4 = docs 11,12,13,14; rels 12→1, 13→2, 14→1.
    //     rank-4 doc 14 is OUTSIDE k=3 and must not count.
    // q2: no judged-relevant docs at all → null recall/ndcg, rr 0.
    // q3: rank 1 = doc 31; rels 31..34 all 1 → ideal truncates at k.
    val results = Seq(
      (1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3), (1L, 14L, 4),
      (2L, 21L, 1), (2L, 22L, 2),
      (3L, 31L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      (1L, 12L, 1.0), (1L, 13L, 2.0), (1L, 14L, 1.0),
      (3L, 31L, 1.0), (3L, 32L, 1.0), (3L, 33L, 1.0), (3L, 34L, 1.0))
      .toDF("query_id", "doc_id", "rel")
    val m = graft.metrics.Metrics
      .retrievalMetrics(results, qrels, "query_id", "doc_id", "rank", "rel", k = 3)
      .orderBy("query_id").collect()
    assert(m.length == 3)
    val q1 = m(0)
    assert((q1.getLong(1), q1.getLong(2), q1.getLong(3)) == ((3L, 3L, 2L)))
    assert(math.abs(q1.getDouble(4) - 2.0 / 3) < 1e-5)       // recall
    assert(math.abs(q1.getDouble(5) - 2.0 / 3) < 1e-5)       // precision
    assert(math.abs(q1.getDouble(6) - 0.5) < 1e-12)          // rr: first rel at rank 2
    val dcg1 = 1.0 / lg2(3.0) + 3.0 / lg2(4.0)               // 12@2 gain 1, 13@3 gain 3
    val idcg1 = 3.0 / lg2(2.0) + 1.0 / lg2(3.0) + 1.0 / lg2(4.0)
    assert(math.abs(q1.getDouble(7) - dcg1 / idcg1) < 1e-5)  // ndcg
    val q2 = m(1)
    assert(q2.getLong(1) == 0L && q2.getLong(3) == 0L)
    assert(q2.isNullAt(4) && q2.isNullAt(7))                 // 0/0 recall, 0/0 ndcg
    assert(q2.getDouble(6) == 0.0)                           // rr with no rel
    val q3 = m(2)
    assert(q3.getLong(1) == 4L && q3.getLong(3) == 1L)
    assert(math.abs(q3.getDouble(4) - 0.25) < 1e-12)
    assert(math.abs(q3.getDouble(6) - 1.0) < 1e-12)
    val idcg3 = 1.0 + 1.0 / lg2(3.0) + 1.0 / lg2(4.0)        // ideal capped at k=3 of 4 rels
    assert(math.abs(q3.getDouble(7) - 1.0 / idcg3) < 1e-5)

    // duplicate judgments for one (query, doc) collapse to max rel —
    // the result join must NOT fan out (n_ret stays k, precision ≤ 1)
    val dupQrels = qrels.union(
      Seq((1L, 13L, 1.0), (1L, 12L, 1.0)).toDF("query_id", "doc_id", "rel"))
    val md = graft.metrics.Metrics
      .retrievalMetrics(results, dupQrels, "query_id", "doc_id", "rank", "rel", k = 3)
      .orderBy("query_id").collect()
    val d1 = md(0)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3)) == ((3L, 3L, 2L)),
      "duplicate qrels must not change counts")
    assert(math.abs(d1.getDouble(7) - q1.getDouble(7)) < 1e-12,
      "max-rel collapse keeps 13's grade 2 → identical ndcg")
  }
}
