package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Association

/** Golden semantics for association-rule mining on a hand-checkable
  * basket fixture.
  */
class AssociationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // 4 baskets: {A,B} ×3, {A,C} ×1 → n=4, c_A=4, c_B=3, c_C=1,
  // c_AB=3, c_AC=1. Duplicate item rows inside a basket must collapse.
  private lazy val rows = Seq(
    (1L, "A"), (1L, "B"), (1L, "B"), // dup (1,B) membership
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "B"),
    (4L, "A"), (4L, "C")).toDF("basket", "item")

  test("rules: support/confidence/lift from exact membership counts, dup rows collapse") {
    val got = Association.rules(rows, col("basket"), col("item"),
        minSupport = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toList
    assert(got.size == 2)
    val ab = got.find(p => p._1 == "A" && p._2 == "B").get
    assert(ab._3 == 3 && ab._4 == 0.75 && ab._5 == 0.75)
    assert(ab._6 == 3.0 * 4 / (4 * 3)) // lift 1.0: B appears iff A does... in 3/4
    val ac = got.find(p => p._1 == "A" && p._2 == "C").get
    assert(ac._3 == 1 && ac._6 == 1.0 * 4 / (4 * 1)) // lift 1.0
  }

  test("rules: minSupport filters and topK cuts by (lift, items) deterministically") {
    val one = Association.rules(rows, col("basket"), col("item"),
      minSupport = 2, topK = 10).collect()
    assert(one.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("A", "B")))
    val none = Association.rules(rows, col("basket"), col("item"),
      minSupport = 4, topK = 10).collect()
    assert(none.isEmpty)
    val k1 = Association.rules(rows, col("basket"), col("item"),
      minSupport = 1, topK = 1).collect()
    assert(k1.length == 1) // equal lifts → (item_a, item_b) breaks the tie
    assert((k1(0).getString(0), k1(0).getString(1)) == ("A", "B"))
  }
}
