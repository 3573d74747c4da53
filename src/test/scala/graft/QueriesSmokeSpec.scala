package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query executes on sf0.001 and the flagship
  * entry() returns rows. (Value-level correctness is the DuckDB oracle's
  * job — tools/compare_oracle.py / the driver's CORRECTNESS gate.)
  */
class QueriesSmokeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      fn(spark, dir).count() // must not throw; row count may be 0 for pair queries at tiny sf
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
