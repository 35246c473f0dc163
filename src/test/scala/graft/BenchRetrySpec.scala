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

  test("parseBand is unaffected by the round-11 keys after the queries map") {
    // A detail file written by the current Bench carries retried/over_band/
    // drift AFTER the queries object; pointing SPARK_GRAFT_BAND at one
    // (instead of a band_median.py-authored band) must still parse the
    // per-query map and nothing else — the regex stops at the map's `}`.
    val line = """{"metric":"total","value":68.266,"unit":"sec",""" +
      """"queries":{"qa":1.5,"qb":0.25},"n_ok":134,"n_failed":0,""" +
      """"retried":["qb"],"over_band":0,"drift":1.065,""" +
      """"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseBand(line) === Map("qa" -> 1.5, "qb" -> 0.25))
    assert(Bench.parseBandSf(line) === Some("/root/testdata/sf0.1"))
  }

  test("parseBand on garbage or empty input yields an empty map (retries off)") {
    assert(Bench.parseBand("") === Map.empty)
    assert(Bench.parseBand("not json at all") === Map.empty)
    assert(Bench.parseBand("""{"metric":"total","value":1.0}""") === Map.empty)
  }

  test("retryPlan selects only >factor× outliers, largest excess first") {
    val band = Bench.parseBand(bandLine)
    // The round-9 driver numbers: q48 18.6 s over band, q59 14.4 s over,
    // q47 4.9 s over; q01 quiet. (Here ratio order and excess order
    // coincide; the BENCH_r18 pin below is where they diverge.)
    val times = Seq(
      "q01_agg" -> 0.350,
      "q47_upsert_merge" -> 5.453,
      "q48_lambda_view_union" -> 19.064,
      "q59_returned_items" -> 15.192)
    assert(Bench.retryPlan(times, band) ===
      Seq("q48_lambda_view_union", "q59_returned_items", "q47_upsert_merge"))
  }

  test("BENCH_r18 topology: the cap goes to absolute excess — q133 first") {
    // The r18 driver run (the motivating live failure, VERDICT r18 #2):
    // the 16 retry slots — then RATIO-ordered — all went to small-band
    // queries whose first samples read 3-4× under uniform burst load
    // (trivial absolute excess, q56's band is 73 ms), while
    // q133_dedup_roi's 13.112 s first sample (2.98× its 4.398 s band =
    // 8.714 s of excess, 15% of the run's total inflation and its single
    // largest correctable term) ranked 17th by ratio and was never
    // retried. Band entries below are the committed band's real values
    // for the 16 names BENCH_r18 actually retried; first samples are
    // placed at a uniform 3.2× (all ABOVE q133's 2.98 ratio, so the old
    // ordering provably excludes q133 on this exact topology).
    val smallBands = Seq(
      "q12_cube_lineitem" -> 0.417, "q51_simhash_neardup" -> 1.542,
      "q129_pareto_classes" -> 1.089, "q52_embedding_lsh_ann" -> 0.609,
      "q130_basket_pairs" -> 1.819, "q56_json_struct" -> 0.073,
      "q53_multimodal_meta" -> 0.102, "q57_shipping_priority" -> 0.553,
      "q54_udf_vowel_density" -> 0.102, "q55_udaf_lang_sketch" -> 0.161,
      "q132_retention_matrix" -> 0.614, "q27_json_props" -> 0.419,
      "q128_activity_streaks" -> 0.209, "q21_value_percentiles" -> 0.18,
      "q23_acctbal_stats" -> 0.221, "q131_leadtime_percentiles" -> 0.449)
    val band = (smallBands :+ ("q133_dedup_roi" -> 4.398)).toMap
    val times = smallBands.map { case (n, b) => n -> b * 3.2 } :+
      ("q133_dedup_roi" -> 13.112)
    val plan = Bench.retryPlan(times, band)
    assert(plan.size === Bench.RetryCap) // 17 candidates, 16 slots
    // The 8.7 s correctable term now leads the plan instead of missing it.
    assert(plan.head === "q133_dedup_roi")
    // The one slot q133 takes comes from the SMALLEST absolute excess
    // (q56: 0.073 band × 2.2 excess-multiple = 0.16 s — the least a
    // retry could ever win back), not from any material candidate.
    assert(!plan.contains("q56_json_struct"))
    assert(smallBands.map(_._1).filterNot(_ == "q56_json_struct")
      .forall(plan.contains))
  }

  test("retryPlan boundary: exactly factor× is NOT an outlier, just above is") {
    val band = Map("qa" -> 1.0, "qb" -> 1.0)
    assert(Bench.RetryFactor === 2.0) // aligned with the driver's 2x gate (r11)
    assert(Bench.retryPlan(Seq("qa" -> 2.0, "qb" -> 2.001), band) === Seq("qb"))
  }

  test("retryPlan catches the BENCH_r10 escape zone (2-3x band)") {
    // The live r10 failure: q112 2.71x, q117 2.89x, q122 2.29x sat over the
    // driver's 2x gate but under the old 3x trigger. They must now plan.
    val band = Map("q112" -> 0.713, "q117" -> 0.452, "q122" -> 2.244)
    val times = Seq("q112" -> 1.93, "q117" -> 1.31, "q122" -> 5.14)
    assert(Bench.retryPlan(times, band).toSet === Set("q112", "q117", "q122"))
  }

  test("retryPlan is capped so a genuine full-suite regression survives retry") {
    val band = (1 to 50).map(i => f"q$i%02d" -> 1.0).toMap
    val times = (1 to 50).map(i => f"q$i%02d" -> (3.0 + i * 0.1))
    val plan = Bench.retryPlan(times, band)
    assert(plan.size === Bench.RetryCap)
    assert(Bench.RetryCap === 16) // raised from 10 after r10 saturated
    assert(plan.size < 50 / 2)    // most of the suite keeps its first sample
    assert(plan.head === "q50")   // largest excess first
  }

  test("overBandCount counts post-retry residue; -1 flags a missing band") {
    val band = Map("qa" -> 1.0, "qb" -> 1.0, "qc" -> 1.0, "qz" -> 0.0)
    val finals = Seq(
      "qa" -> 0.9,   // quiet
      "qb" -> 2.0,   // exactly the factor: NOT over (matches retryPlan)
      "qc" -> 2.5,   // still inflated after its retry → counted
      "qd" -> 99.0,  // no band entry: no denominator, not counted
      "qz" -> 99.0,  // zero band entry: no ratio defined
      "qe" -> -1.0)  // failed: reported in "failed", not here
    assert(Bench.overBandCount(finals, band) === 1)
    assert(Bench.overBandCount(finals, Map.empty) === -1)
    // A band that shares no names with the run has no denominator either:
    // the sentinel, not the verified-quiet 0 (matches bandDriftMedian).
    assert(Bench.overBandCount(finals, Map("q_gone" -> 1.0)) === -1)
  }

  test("overBandNames names exactly overBandCount's residue, largest excess first, capped") {
    val band = Map("qa" -> 1.0, "qb" -> 1.0, "qc" -> 1.0, "qz" -> 0.0)
    val finals = Seq(
      "qa" -> 0.9,   // quiet
      "qb" -> 2.0,   // exactly the factor: NOT over (matches overBandCount)
      "qc" -> 2.5,   // residue → named
      "qd" -> 99.0,  // no band entry: no denominator, never named
      "qz" -> 99.0,  // zero band entry: no ratio defined
      "qe" -> -1.0)  // failed: loud in "failed", not here
    assert(Bench.overBandNames(finals, band) === Seq("qc"))
    assert(Bench.overBandNames(finals, band).size ===
      Bench.overBandCount(finals, band))
    // Quiet run / missing band: EMPTY → the key is absent from the line
    // (the common case pays zero bytes; over_band alone carries 0 / -1).
    assert(Bench.overBandNames(Seq("qa" -> 0.9), band) === Seq.empty)
    assert(Bench.overBandNames(finals, Map.empty) === Seq.empty)
    // Worst ratio first, and bounded by OverBandNamesCap so the one JSON
    // line can never blow past the driver's tail capture even if the whole
    // suite regresses (over_band's uncapped N still discloses the true
    // count). The cap sits BELOW RetryCap (r14 ADVICE): a saturated run
    // carries 16 retried names on the same line, so 16 more here would
    // risk the ~1 KB bound exactly when diagnosis matters — and main()'s
    // LineBudget guard is the hard stop behind this soft cap.
    val wideBand = (1 to 50).map(i => f"q$i%02d" -> 1.0).toMap
    val wideFinals = (1 to 50).map(i => f"q$i%02d" -> (3.0 + i * 0.1))
    val names = Bench.overBandNames(wideFinals, wideBand)
    assert(names.size === Bench.OverBandNamesCap)
    assert(Bench.OverBandNamesCap === 8)
    assert(Bench.OverBandNamesCap < Bench.RetryCap)
    assert(names.head === "q50") // largest excess leads
    assert(Bench.overBandCount(wideFinals, wideBand) === 50) // uncapped count
  }

  test("bandDriftMedian reports uniform load; spikes don't drag the median") {
    val band = Map("qa" -> 1.0, "qb" -> 2.0, "qc" -> 4.0)
    // Uniform 1.25x load reads as exactly 1.25.
    assert(Bench.bandDriftMedian(
      Seq("qa" -> 1.25, "qb" -> 2.5, "qc" -> 5.0), band) === 1.25)
    // One 20x spike on an otherwise-quiet suite: median stays quiet (1.0),
    // so the spike reads as a singleton (over_band), NOT as drift.
    assert(Bench.bandDriftMedian(
      Seq("qa" -> 1.0, "qb" -> 2.0, "qc" -> 80.0), band) === 1.0)
    // Even count: mean of the middle two.
    assert(Bench.bandDriftMedian(
      Seq("qa" -> 1.0, "qb" -> 4.0), band) === 1.5)
    // Failed queries and band-less queries contribute no ratio.
    assert(Bench.bandDriftMedian(
      Seq("qa" -> -1.0, "qx" -> 9.0, "qb" -> 2.0), band) === 1.0)
    // No usable pairs at all: the -1 sentinel, matching over_band's.
    assert(Bench.bandDriftMedian(Seq("qx" -> 9.0), band) === -1.0)
    assert(Bench.bandDriftMedian(Seq("qa" -> 1.0), Map.empty) === -1.0)
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

  test("budgetedLine degrades to the first in-budget candidate, last wins") {
    // r15 ADVICE: the failed list was unbounded — a mass-failure run (134
    // failed names ≈ 3+ KB) blew the driver's ~1 KB tail capture exactly
    // when diagnosis mattered. main() now hands budgetedLine the ladder
    // [full, no over_band_names, no failed names]; the counts survive
    // every rung because they live outside the dropped keys.
    val fits = "x" * Bench.LineBudget          // exactly at budget: kept
    val over = "y" * (Bench.LineBudget + 1)    // one past: dropped
    assert(Bench.budgetedLine(Seq(fits, "z")) === fits)
    assert(Bench.budgetedLine(Seq(over, fits)) === fits)
    assert(Bench.budgetedLine(Seq(over, "z")) === "z")
    // No candidate fits → the last (bounded-by-construction) one is
    // emitted regardless: a too-long line beats NO line.
    assert(Bench.budgetedLine(Seq(over, over + "!")) === over + "!")
    // Empty ladder (r16 ADVICE): summary emission must never crash —
    // a parseable sentinel beats a NoSuchElementException mid-bench.
    assert(Bench.budgetedLine(Seq.empty) === "{}")
    // A 134-name failed list alone exceeds the budget — the exact r15
    // ADVICE scenario this ladder exists for.
    val massFailure = (1 to 134)
      .map(i => f""""q$i%03d_some_query_name"""").mkString(""","failed":[""", ",", "]")
    assert(massFailure.length > Bench.LineBudget)
  }

  private def overNamesOn(line: String): Seq[String] =
    """"over_band_names":\[([^\]]*)\]""".r.findFirstMatchIn(line)
      .map(_.group(1).split(",").filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  test("BENCH_r17 topology: top-3 over_band names survive the saturated line") {
    // The r17 driver line read "over_band":42 with ZERO names — the old
    // ladder dropped the whole list on its first degradation (16 retried
    // names + the 15-slowest map left no room for 8 names), so a reader
    // could not distinguish "42 uniform noise" from "42 regressions" off
    // the line. The ladder now trims the list to the worst
    // OverBandKeepCap names and sheds slowest-map TAIL entries instead.
    val names = (1 to 134).map(i => f"q$i%03d_realistic_name")
    val band = names.map(_ -> 0.5).toMap
    // 42 queries over the 2.0 trigger (worst ratios at the top indices);
    // the other 92 at the r17 drift (~1.7x, under the trigger).
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i >= 92) 0.5 * (3.0 + i * 0.01) else 0.85)
    }
    val retried = names.takeRight(16) // the saturated RetryCap, as in r17
    val (detail, stdout) = Bench.summaryLines(results, Seq.empty, retried,
      band, "/root/testdata/sf0.1")
    assert(stdout.length <= Bench.LineBudget)
    assert(stdout.contains(""""over_band":42"""))
    val got = overNamesOn(stdout)
    assert(got.size === Bench.OverBandKeepCap)
    assert(got.head === "\"q134_realistic_name\"") // largest excess leads
    // Counts and the full retried list survive every degradation.
    assert(stdout.contains(""""n_ok":134,"n_failed":0"""))
    assert(stdout.contains("\"q119_realistic_name\""))
    // The untracked detail line carries the UNCAPPED 42-name residue.
    assert(overNamesOn(detail).size === 42)
    assert(detail.contains(""""over_band":42"""))
  }

  test("summaryLines k=0 rung is bounded: adversarial names + mass failure") {
    // Worst case over any plausible topology: 30-char names everywhere,
    // 16 failed queries (their names dropped from later rungs; the
    // n_failed count never), a saturated retried list, and a 118-name
    // residue. The final rung (empty queries map, no failed names, top-3
    // over names) must fit the budget BY CONSTRUCTION — budgetedLine's
    // unconditional last-candidate emission relies on it.
    val names = (1 to 134).map(i => f"q$i%03d_" + "x" * 24) // 29-30 B names
    val band = names.map(_ -> 0.5).toMap
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i < 16) -1.0 else 500.0 + i) // 16 failed, 118 far over band
    }
    val failed = names.take(16)
    val retried = names.takeRight(Bench.RetryCap)
    val (_, stdout) = Bench.summaryLines(results, failed, retried, band,
      "/root/testdata/sf0.1")
    assert(stdout.length <= Bench.LineBudget,
      s"final rung must be bounded, got ${stdout.length} B")
    assert(stdout.contains(""""n_ok":118,"n_failed":16"""))
    assert(stdout.contains(""""over_band":118"""))
    assert(overNamesOn(stdout).size === Bench.OverBandKeepCap)
    // A quiet line pays zero bytes for the key and keeps all 15 slowest.
    val quiet = names.map(_ -> 0.5)
    val (_, quietLine) = Bench.summaryLines(quiet, Seq.empty, Seq.empty,
      band, "/root/testdata/sf0.1")
    assert(!quietLine.contains("over_band_names"))
    assert(quietLine.contains(""""over_band":0"""))
  }
}
