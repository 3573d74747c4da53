package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Custom TypedImperativeAggregate (grouped top-k by score): ordering
  * semantics vs the window-sort reference, tie-breaks, k-bounding,
  * partial-aggregation correctness, SQL surface.
  */
class TopKSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("keeps the k highest scores, payload-ASC tiebreak, sorted") {
    GraftFunctions.register(spark)
    val df = Seq(("b", 2.0), ("a", 3.0), ("c", 3.0), ("d", 1.0), ("e", 2.5))
      .toDF("p", "s")
    val got = df.agg(GraftFunctions.topK(col("s"), col("p"), 3).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.score"), col("e.payload"))
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    // 3.0 tie: 'a' before 'c'; then 2.5
    assert(got == Seq((3.0, "a"), (3.0, "c"), (2.5, "e")))
  }

  test("matches the window row_number() <= k reference on a large fixture") {
    GraftFunctions.register(spark)
    val rows = (1 to 20000).map { i =>
      (i % 17, s"p${i % 997}", ((i * 2654435761L) % 10000L).toDouble / 100.0)
    }
    // deliberately NOT distinct: duplicate (g, p, s) rows must rank as
    // separate results, exactly as row_number() emits them (multiset
    // semantics — the insertion-tick tiebreak in the buffer)
    val df = rows.toDF("g", "p", "s")
    val viaAgg = df.repartition(16)
      .groupBy("g").agg(GraftFunctions.topK(col("s"), col("p"), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("e.score").as("s"), col("e.payload").as("p"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("p"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank"), col("s"), col("p"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("duplicate (score, payload) pairs are kept as separate ranks, not deduplicated") {
    GraftFunctions.register(spark)
    val df = Seq(("x", 1.0), ("x", 1.0), ("y", 0.5)).toDF("p", "s")
    val got = df.agg(GraftFunctions.topK(col("s"), col("p"), 2).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.score"), col("e.payload"))
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    // row_number() <= 2 over (s DESC, p ASC) returns BOTH (1.0, x) rows
    assert(got == Seq((1.0, "x"), (1.0, "x")))
  }

  test("groups smaller than k return every row; nulls ignored") {
    GraftFunctions.register(spark)
    val df = Seq[(String, java.lang.Double)](("a", 1.0), ("b", null), ("c", 2.0))
      .toDF("p", "s")
    val got = df.agg(GraftFunctions.topK(col("s"), col("p"), 10).as("tk"))
      .select(size(col("tk"))).head().getInt(0)
    assert(got == 2)
  }

  test("usable from plain SQL once registered") {
    GraftFunctions.register(spark)
    Seq(("x", 1.0), ("y", 9.0), ("z", 5.0)).toDF("p", "s")
      .createOrReplaceTempView("tk_t")
    val got = spark.sql(
        "SELECT graft_top_k(s, p, 2) AS tk FROM tk_t")
      .select(explode(col("tk")))
      .select(col("col.payload")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("y", "z"))
  }
}
