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
      // Full-column materialization (TestSpark.materialize scaladoc):
      // count() would let Catalyst prune a throwing column.
      TestSpark.materialize(q.fn(spark, TestSpark.sf0001))
    }
  }

  test("every oracle entry has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("the no-oracle set is exactly the 11 SURVEY-designed queries") {
    // A query missing its oracleSql entry silently downgrades from the
    // driver's rows+schema+hash check to rows-only. That downgrade is BY
    // DESIGN for the sketch/hash-seeded/approximate set below (their
    // correctness is carried by statistical ScalaTest contracts) and for
    // no one else — a typo'd or dropped oracle key must be loud here, not
    // a quietly weaker CORRECTNESS_rN entry.
    val designed = Set(
      "q49_approx_distinct", "q50_minhash_lsh", "q51_simhash_neardup",
      "q52_embedding_lsh_ann", "q55_udaf_lang_sketch", "q69_approx_percentiles",
      "q70_stratified_sample", "q72_bloom_prefilter", "q73_cms_frequencies",
      "q86_ivf_ann", "q94_semantic_dedup")
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet === designed)
  }
}
