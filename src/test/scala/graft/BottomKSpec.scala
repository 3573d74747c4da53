package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Custom TypedImperativeAggregate (KMV bottom-k sketch): distinct
  * semantics, k-bounding, partial-aggregation correctness, SQL surface.
  */
class BottomKSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("keeps the k smallest distinct values, sorted") {
    GraftFunctions.register(spark)
    val df = Seq(5L, 3L, 9L, 3L, 1L, 7L, 1L, 8L).toDF("v")
    val got = df.agg(GraftFunctions.bottomK(col("v"), 3).as("s"))
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 3L, 5L))
  }

  test("groups smaller than k return all distinct values") {
    GraftFunctions.register(spark)
    val got = Seq(2L, 2L).toDF("v")
      .agg(GraftFunctions.bottomK(col("v"), 5)).head().getSeq[Long](0)
    assert(got == Seq(2L))
  }

  test("partial aggregation across many partitions matches single-partition result") {
    GraftFunctions.register(spark)
    val vals = (1L to 5000L).map(i => (i % 4, (i * 2654435761L) % 100000L))
    val one = vals.toDF("g", "v").coalesce(1)
      .groupBy("g").agg(GraftFunctions.bottomK(col("v"), 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val many = vals.toDF("g", "v").repartition(16)
      .groupBy("g").agg(GraftFunctions.bottomK(col("v"), 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(one == many)
    // and equals the unbounded reference computation
    val ref = vals.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(10)
    }
    ref.foreach { case (g, want) => assert(one(g) == want, s"g=$g") }
  }

  test("nulls are ignored") {
    GraftFunctions.register(spark)
    val got = Seq[java.lang.Long](4L, null, 2L).toDF("v")
      .agg(GraftFunctions.bottomK(col("v"), 3)).head().getSeq[Long](0)
    assert(got == Seq(2L, 4L))
  }

  test("usable from plain SQL once registered") {
    GraftFunctions.register(spark)
    Seq(30L, 10L, 20L).toDF("v").createOrReplaceTempView("bk_t")
    val got = spark.sql("SELECT graft_bottom_k(v, 2) FROM bk_t").head().getSeq[Long](0)
    assert(got == Seq(10L, 20L))
  }
}
