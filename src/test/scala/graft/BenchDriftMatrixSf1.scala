package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Drift

/** The driftMatrix cost claim, measured (VERDICT r15 #5 done-criterion):
  * one-pass (slice × feature) matrix cost vs single-column operator
  * calls on the SAME lineitem fixture. The honest comparison set:
  * each single-column metric once on one feature (psi/ks/w1/js/chi2 on
  * `quantity`), their sum (= "one feature, every metric, separate
  * calls"), and the full matrix (4 features × 3 slices × 6 metrics =
  * 72 metric cells). A per-call sweep of all 24 (feature × metric)
  * single-column combinations would cost ~24× one call — the matrix
  * should cost ≈ 2× ONE call total. Run via
  * `sbt "Test/runMain graft.BenchDriftMatrixSf1"`; output committed as
  * BENCH_driftmatrix_sf1.json.
  */
object BenchDriftMatrixSf1 {
  private def timeS[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }
  private def f3(v: Double): Double = math.rint(v * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = 3
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s((s.length - 1) / 2) }
    val results = Seq("/root/testdata/sf0.1" -> "sf0.1", "/tmp/sf1" -> "sf1")
      .map { case (dir, tag) =>
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity").cast("double").as("quantity"),
            col("l_discount").cast("double").as("discount"),
            col("l_tax").cast("double").as("tax"),
            round(col("l_extendedprice") / 1000.0, 0).as("price_k"))
        val ref = li.filter(col("l_orderkey") % 2 === 0)
        val cur = li.filter(col("l_orderkey") % 2 === 1)
        val n = li.count() // warm page cache outside every timing
        def lane(f: => Long): Double = med((1 to reps).map(_ => timeS(f)))
        val tPsi = lane(Drift.psi(ref, cur, col("quantity")).count())
        val tKs = lane(Drift.ksStatistic(ref, cur, col("quantity")).count())
        val tW1 = lane(Drift.wasserstein1(ref, cur, col("quantity")).count())
        val tJs = lane(Drift.jsDivergence(ref, cur, col("quantity")).count())
        val tChi = lane(Drift.chiSquaredDrift(ref, cur, col("quantity")).count())
        val tMx = lane(Drift.driftMatrix(ref, cur,
          Seq("quantity", "discount", "tax", "price_k"),
          slice = Some(col("l_returnflag"))).count())
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        s""""$tag":{"n_rows":$n,"psi_1col_sec":${f3(tPsi)},""" +
          s""""ks_1col_sec":${f3(tKs)},"w1_1col_sec":${f3(tW1)},""" +
          s""""js_1col_sec":${f3(tJs)},"chi2_1col_sec":${f3(tChi)},""" +
          s""""sum_1feature_all_metrics_sec":${f3(tPsi + tKs + tW1 + tJs + tChi)},""" +
          s""""matrix_4feat_3slice_sec":${f3(tMx)}}"""
      }
    val line =
      s"""{"metric":"driftmatrix_scaling","reps_each":$reps,"median":true,${results.mkString(",")}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_driftmatrix_sf1.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
