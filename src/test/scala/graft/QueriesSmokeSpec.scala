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

  test("every query carries oracle SQL (102/102-green invariant, round 11)") {
    // Since round 11 even the approximate queries emit deterministic
    // certification rows with hash-checked oracles — a new query landing
    // without one silently downgrades the driver's gate to a rows-only
    // check, which this pins as a failure instead.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.toSeq.sorted}")
  }
}
