package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Misra-Gries heavy-hitters aggregate: presence and estimate
  * guarantees hold for any arrival order / partitioning, size bound,
  * SQL surface.
  */
class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Collect (item → est) from the sketch column. */
  private def sketch(rows: Seq[Long], k: Int, parts: Int): Map[Long, Long] = {
    GraftFunctions.register(spark)
    rows.toDF("v").repartition(parts)
      .agg(GraftFunctions.heavyHitters(col("v"), k).as("s"))
      .head().getSeq[Row](0).map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** The MG contract against exact counts: every item with
    * c > n/(k+1) present; every estimate in [c − n/(k+1), c].
    */
  private def assertContract(rows: Seq[Long], k: Int, parts: Int): Map[Long, Long] = {
    val sk = sketch(rows, k, parts)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slack = rows.size.toDouble / (k + 1)
    exact.foreach { case (item, c) =>
      if (c > slack) assert(sk.contains(item), s"heavy item $item (c=$c) missing")
    }
    sk.foreach { case (item, est) =>
      val c = exact(item)
      assert(est <= c, s"overestimate: $item est=$est > c=$c")
      assert(c - est <= slack, s"bound broken: $item c=$c est=$est slack=$slack")
    }
    assert(sk.size <= k)
    sk
  }

  test("guarantees hold on a skewed stream, single partition") {
    val rows = Seq.fill(500)(1L) ++ Seq.fill(300)(2L) ++
      (0 until 200).map(i => 100L + i) // long tail of singletons
    val sk = assertContract(rows, k = 4, parts = 1)
    assert(sk.contains(1L) && sk.contains(2L))
  }

  test("guarantees hold under partial aggregation across partitions") {
    val rnd = new scala.util.Random(7)
    // zipf-ish: item i with weight ~ 1/i over 50 items (precomputed CDF)
    val weights = (1 to 50).map(1.0 / _)
    val cdf = weights.scanLeft(0.0)(_ + _).tail.map(_ / weights.sum)
    val rows = (0 until 20000).map { _ =>
      val u = rnd.nextDouble()
      (cdf.indexWhere(u < _) match { case -1 => 50; case i => i + 1 }).toLong
    }
    for (parts <- Seq(1, 4, 16)) assertContract(rows, k = 8, parts)
  }

  test("fewer distinct values than k: exact counts, all present") {
    val rows = Seq.fill(10)(1L) ++ Seq.fill(5)(2L)
    val sk = sketch(rows, k = 5, parts = 3)
    assert(sk == Map(1L -> 10L, 2L -> 5L))
  }

  test("result is sorted by estimate desc, item asc") {
    GraftFunctions.register(spark)
    val rows = Seq.fill(10)(3L) ++ Seq.fill(10)(1L) ++ Seq.fill(4)(2L)
    val arr = rows.toDF("v").coalesce(1)
      .agg(GraftFunctions.heavyHitters(col("v"), 5).as("s"))
      .head().getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1)))
    assert(arr == Seq((1L, 10L), (3L, 10L), (2L, 4L)))
  }

  test("nulls are ignored; all-null input yields an empty sketch") {
    GraftFunctions.register(spark)
    val df = Seq[java.lang.Long](null, null, 5L).toDF("v")
    val got = df.agg(GraftFunctions.heavyHitters(col("v"), 3).as("s"))
      .head().getSeq[Row](0)
    assert(got.map(r => (r.getLong(0), r.getLong(1))) == Seq((5L, 1L)))
    val empty = Seq[java.lang.Long](null).toDF("v")
      .agg(GraftFunctions.heavyHitters(col("v"), 3).as("s"))
      .head().getSeq[Row](0)
    assert(empty.isEmpty)
  }

  test("SQL surface via registry") {
    GraftFunctions.register(spark)
    Seq(1L, 1L, 2L).toDF("v").createOrReplaceTempView("hh_in")
    val got = spark.sql(
      "SELECT graft_heavy_hitters(v, 2) AS s FROM hh_in")
      .head().getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((1L, 2L), (2L, 1L)))
  }
}
