package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Count-min sketch aggregate: overestimate-only guarantee, exactness
  * without collisions, full order-invariance across partitionings,
  * point-query helper, SQL surface.
  */
class CountMinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def sketchOf(rows: Seq[Long], w: Int, d: Int, parts: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    rows.toDF("v").repartition(parts)
      .agg(GraftFunctions.countMin(col("v"), w, d).as("s"))
      .head().getSeq[Long](0)
  }

  test("estimates never underestimate; exact at generous width") {
    GraftFunctions.register(spark)
    val rows = Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(3)(3L)
    val df = rows.toDF("v")
    val sk = df.agg(GraftFunctions.countMin(col("v"), 1024, 4).as("s"))
    val got = df.distinct().crossJoin(sk)
      .select(col("v"),
        GraftFunctions.countMinQuery(col("s"), col("v"), 1024, 4).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 items in 1024×4 cells: collision-free with this fixed hash
    assert(got == Map(1L -> 40L, 2L -> 25L, 3L -> 3L))
  }

  test("overestimate-only under forced collisions") {
    GraftFunctions.register(spark)
    val rows = (0L until 500L).flatMap(i => Seq.fill((i % 5).toInt + 1)(i))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = rows.toDF("v")
    val sk = df.agg(GraftFunctions.countMin(col("v"), 16, 3).as("s"))
    val got = df.distinct().crossJoin(sk)
      .select(col("v"),
        GraftFunctions.countMinQuery(col("s"), col("v"), 16, 3).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    got.foreach { case (v, est) =>
      assert(est >= exact(v), s"underestimate for $v")
    }
    // 500 items in 16-wide rows: collisions are certain
    assert(got.exists { case (v, est) => est > exact(v) })
  }

  test("the sketch is identical under any partitioning (order-invariant)") {
    val rows = (0 until 5000).map(i => (i * 2654435761L) % 300L)
    val one = sketchOf(rows, 32, 4, 1)
    val four = sketchOf(rows, 32, 4, 4)
    val sixteen = sketchOf(rows, 32, 4, 16)
    assert(one == four && four == sixteen)
    assert(one.sum == 5000L * 4) // every row increments once per depth row
  }

  test("nulls are ignored; empty input yields an all-zero sketch") {
    GraftFunctions.register(spark)
    val sk = Seq[java.lang.Long](null, null).toDF("v")
      .agg(GraftFunctions.countMin(col("v"), 8, 2).as("s"))
      .head().getSeq[Long](0)
    assert(sk.length == 16 && sk.forall(_ == 0L))
  }

  test("weighted insert over grouped rows equals unweighted over raw rows") {
    GraftFunctions.register(spark)
    val rows = (0L until 400L).flatMap(i => Seq.fill((i % 7).toInt + 1)(i % 37L))
    val raw = rows.toDF("v")
      .agg(GraftFunctions.countMin(col("v"), 16, 3).as("s"))
      .head().getSeq[Long](0)
    val grouped = rows.toDF("v").groupBy("v").agg(count(lit(1)).as("n"))
      .agg(GraftFunctions.countMinWeighted(col("v"), col("n"), 16, 3).as("s"))
      .head().getSeq[Long](0)
    assert(raw == grouped) // counters are sums: n unit inserts ≡ one weight-n insert
  }

  test("weighted insert: null and zero weights contribute nothing") {
    GraftFunctions.register(spark)
    val sk = Seq((1L, java.lang.Long.valueOf(5L)), (2L, null),
        (3L, java.lang.Long.valueOf(0L)))
      .toDF("v", "n")
      .agg(GraftFunctions.countMinWeighted(col("v"), col("n"), 8, 2).as("s"))
      .head().getSeq[Long](0)
    assert(sk.sum == 5L * 2) // only (1, 5) lands, once per depth row
  }

  test("SQL surface via registry") {
    GraftFunctions.register(spark)
    Seq(7L, 7L, 8L).toDF("v").createOrReplaceTempView("cm_in")
    val sk = spark.sql("SELECT graft_count_min(v, 8, 2) AS s FROM cm_in")
      .head().getSeq[Long](0)
    assert(sk.length == 16 && sk.sum == 3L * 2)
  }
}
