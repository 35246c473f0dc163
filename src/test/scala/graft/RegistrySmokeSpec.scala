package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute end-to-end at sf0.001 and (for the
  * shapes the driver smoke-checks) return rows. */
class RegistrySmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val n = q.fn(spark, TestSpark.sf0001).count()
      assert(n >= 0)
    }
  }

  test("every oracle entry has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
