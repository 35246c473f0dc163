package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench host-noise defense (Bench.parseBand / Bench.retryPlan) is pure
  * logic — tested without a SparkSession. The synthetic cases mirror the
  * round-9 driver run that motivated it: a contiguous block of queries at
  * 3-38× band on an otherwise-quiet suite. */
class BenchRetrySpec extends AnyFunSuite {

  private val bandLine =
    """{"metric":"total","value":63.778,"unit":"sec",""" +
      """"queries":{"q01_agg":0.345,"q47_upsert_merge":0.510,""" +
      """"q48_lambda_view_union":0.506,"q59_returned_items":0.770},""" +
      """"n_ok":134,"n_failed":0,"sf":"/root/testdata/sf0.1","band_samples":3}"""

  test("parseBand extracts exactly the per-query map") {
    val band = Bench.parseBand(bandLine)
    assert(band === Map(
      "q01_agg" -> 0.345, "q47_upsert_merge" -> 0.510,
      "q48_lambda_view_union" -> 0.506, "q59_returned_items" -> 0.770))
  }

  test("parseBand on garbage or empty input yields an empty map (retries off)") {
    assert(Bench.parseBand("") === Map.empty)
    assert(Bench.parseBand("not json at all") === Map.empty)
    assert(Bench.parseBand("""{"metric":"total","value":1.0}""") === Map.empty)
  }

  test("retryPlan selects only >factor× outliers, worst ratio first") {
    val band = Bench.parseBand(bandLine)
    // The round-9 driver numbers: q48 37.7x, q59 19.8x, q47 10.7x; q01 quiet.
    val times = Seq(
      "q01_agg" -> 0.350,
      "q47_upsert_merge" -> 5.453,
      "q48_lambda_view_union" -> 19.064,
      "q59_returned_items" -> 15.192)
    assert(Bench.retryPlan(times, band) ===
      Seq("q48_lambda_view_union", "q59_returned_items", "q47_upsert_merge"))
  }

  test("retryPlan boundary: exactly factor× is NOT an outlier, just above is") {
    val band = Map("qa" -> 1.0, "qb" -> 1.0)
    assert(Bench.retryPlan(Seq("qa" -> 3.0, "qb" -> 3.001), band) === Seq("qb"))
  }

  test("retryPlan is capped so a genuine full-suite regression survives retry") {
    val band = (1 to 50).map(i => f"q$i%02d" -> 1.0).toMap
    val times = (1 to 50).map(i => f"q$i%02d" -> (3.0 + i * 0.1))
    val plan = Bench.retryPlan(times, band)
    assert(plan.size === 10)
    assert(plan.head === "q50") // worst ratio first
  }

  test("retryPlan ignores failed queries, zero bands, and unknown queries") {
    val band = Map("qa" -> 1.0, "qb" -> 0.0)
    val times = Seq(
      "qa" -> -1.0,   // failed: time-to-failure must never be "improved"
      "qb" -> 50.0,   // zero band entry: no ratio defined
      "qc" -> 50.0)   // not in band: new query, no denominator yet
    assert(Bench.retryPlan(times, band) === Seq.empty)
  }

  test("retryPlan with no band file is a no-op") {
    assert(Bench.retryPlan(Seq("qa" -> 99.0), Map.empty) === Seq.empty)
  }

  test("parseBandSf reads the band's scale dir (mismatch disables retries)") {
    assert(Bench.parseBandSf(bandLine) === Some("/root/testdata/sf0.1"))
    assert(Bench.parseBandSf("""{"queries":{"qa":1.0}}""") === None)
  }
}
