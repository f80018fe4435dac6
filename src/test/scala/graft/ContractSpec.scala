package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: entry() returns rows, every query name
  * has a runnable plan, and every oracle key maps to a real query.
  */
class ContractSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  test("entry() returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("all queries produce rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSession.Sf0001).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
