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
}
