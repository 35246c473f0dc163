package graft

import org.scalatest.funsuite.AnyFunSuite

/** The combined skew × boundary sweep as ONE committed entry point with
  * its adjudicated expected-failure set PINNED (VERDICT r16 "next round"
  * task 3: "a spark-shell script with a hand-run command rots").
  *
  * Run:  GRAFT_STRESS=1 sbt "testOnly graft.StressSweepSpec"
  *
  * Gated behind GRAFT_STRESS=1 (it re-runs all 134 queries on a ~10^5-row
  * poisoned corpus, ~minutes — too slow for every `sbt test`); ungated
  * runs CANCEL the tests, visibly, at zero cost. Run it after ANY
  * arithmetic change (the r16 rule) and per round before the snapshot.
  *
  * The pin is SET EQUALITY, so drift is loud in both directions: a NEW
  * name failing the sweep is a real domain-vs-fixture bug (fix at the
  * cause — this corpus found q129's internal-accumulator overflow where
  * the single axes didn't); an expected name NO LONGER failing means an
  * adjudicated contract changed and this set must be re-adjudicated
  * consciously, not silently.
  *
  * Expected failures, each adjudicated in BUILDLOG round 16 #9:
  *   - q129_pareto_classes: the ONE BIGINT OUTPUT cast — class A truly
  *     exceeds Long.Max on this corpus (internals exact in DECIMAL(38,0));
  *     revenue_cents BIGINT is the documented output contract, loud
  *     (ANSI) beyond — the same adjudication as the stress header it
  *     replaces.
  *   - q33/q78/q133: the DESIGNED ≤64-word bitmask-vocabulary guard — the
  *     boundary texts blow the 64-word dictionary and the guard fails
  *     LOUDLY, pointing at the q50 MinHash/LSH open-vocabulary path.
  */
class StressSweepSpec extends AnyFunSuite {

  private val gate = sys.env.get("GRAFT_STRESS").contains("1")

  /** name → message-substring proving the failure is the adjudicated KIND,
    * not merely any abort under the right name. */
  private val expected: Map[String, String] = Map(
    "q129_pareto_classes" -> "CAST_OVERFLOW",
    "q33_neardup_pairs" -> "vocabulary exceeds 64 words",
    "q78_dedup_clusters" -> "vocabulary exceeds 64 words",
    "q133_dedup_roi" -> "vocabulary exceeds 64 words")

  /** Full cause-chain text: Spark buries the error class (CAST_OVERFLOW,
    * the assert_true guard text) under SparkException task-failure
    * wrappers, so kind-matching must see every layer. */
  private def chain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(" | ")

  test("combined sweep failure set equals the adjudicated expected set") {
    assume(gate, "set GRAFT_STRESS=1 to run the combined stress sweep")
    val spark = TestSpark.spark
    val dir = StressFixture.build(spark)
    val failures: Map[String, Throwable] = Registry.all.flatMap { q =>
      try { TestSpark.materialize(q.fn(spark, dir)); None }
      catch { case t: Throwable => Some(q.name -> t) }
    }.toMap

    val unexpected = failures.keySet -- expected.keySet
    val missing = expected.keySet -- failures.keySet
    assert(unexpected.isEmpty,
      s"NEW sweep failures — real domain-vs-fixture bugs, fix at the cause: " +
        unexpected.toSeq.sorted.map(n =>
          s"$n: ${chain(failures(n)).linesIterator.next()}").mkString("; "))
    assert(missing.isEmpty,
      s"adjudicated failures no longer fail — re-adjudicate the expected " +
        s"set consciously: ${missing.toSeq.sorted.mkString(", ")}")
    expected.foreach { case (name, kind) =>
      val msg = chain(failures(name))
      assert(msg.contains(kind),
        s"$name failed with the WRONG kind (want substring '$kind'): " +
          msg.linesIterator.next())
    }
  }

  /** Three-way expected set (r17 session 2): the UNION of the non-finite
    * map and the designed vocab-guard trio, with each name mapped to the
    * SET of acceptable kind substrings. Adjudications specific to the
    * composition: (a) q112/q129 carry TWO coexisting adjudicated failure
    * modes on this corpus — the non-finite guard AND the boundary
    * CAST_OVERFLOW detonation — and which exception surfaces first from a
    * failed stage depends on task scheduling (partitioning, core count),
    * not just the fixed fixture (r17 ADVICE: a single-kind pin here is
    * machine-dependent). Either kind proves the abort is the adjudicated
    * class, so both are accepted; the single-axis sweeps above/in
    * NonFiniteInputSpec still pin each mode individually on corpora where
    * only one exists. (b) q78/q133 flip from the two-way sweep's vocab
    * kind only in WRAPPER (direct USER_RAISED vs stage-materialization),
    * same message — the substring match is wrapper-agnostic by design. */
  private val triExpected: Map[String, Set[String]] =
    NonFiniteExpectations.expected.view.mapValues(k => Set(k)).toMap ++
      Seq("q33_neardup_pairs", "q78_dedup_clusters", "q133_dedup_roi")
        .map(_ -> Set("vocabulary exceeds 64 words")) ++
      Seq("q112_part_value_share", "q129_pareto_classes")
        .map(_ -> Set("non-finite double", "CAST_OVERFLOW"))

  test("three-way (skew x boundary x non-finite) failure set matches") {
    assume(gate, "set GRAFT_STRESS=1 to run the three-way stress sweep")
    val spark = TestSpark.spark
    val dir = TriStressFixture.build(spark)
    val failures: Map[String, Throwable] = Registry.all.flatMap { q =>
      try { TestSpark.materialize(q.fn(spark, dir)); None }
      catch { case t: Throwable => Some(q.name -> t) }
    }.toMap

    val unexpected = failures.keySet -- triExpected.keySet
    val missing = triExpected.keySet -- failures.keySet
    assert(unexpected.isEmpty,
      s"NEW three-way failures — a guard or contract shifted under skew: " +
        unexpected.toSeq.sorted.map(n =>
          s"$n: ${chain(failures(n)).linesIterator.next()}").mkString("; "))
    assert(missing.isEmpty,
      s"adjudicated three-way aborts no longer abort — re-adjudicate: " +
        missing.toSeq.sorted.mkString(", "))
    triExpected.foreach { case (name, kinds) =>
      val msg = chain(failures(name))
      assert(kinds.exists(msg.contains),
        s"$name failed with the WRONG kind (want one of " +
          s"${kinds.mkString("'", "' / '", "'")}): " +
          msg.linesIterator.next())
    }
  }

  test("temporal x skew failure set is exactly the q101 spine guard") {
    assume(gate, "set GRAFT_STRESS=1 to run the temporal x skew sweep")
    // Temporal classes composed ON TOP of the duplicate-key corpus:
    // MegaOrder = MegaUser = 0 land in temporal class 0 on every modulus,
    // so the 10^5-row mega-order carries l_shipdate 0001-01-03 through
    // the skewed join (o_orderdate 0001-01-01 on its order row) and the
    // mega-user's stream spans 0001..9999. Adjudication: calendar
    // extremes stay LEGAL VALUES under pathological key distributions —
    // the only abort is q101's designed spine cap, whose kind must
    // surface unchanged from the skewed per-user aggregation (a
    // scheduling-independent single kind: no competing adjudicated
    // failure mode exists on this corpus, unlike the tri sweep's
    // q112/q129 pair).
    val spark = TestSpark.spark
    val dir = TemporalFixture.build(spark, SkewFixture.build(spark))
    val failures: Map[String, Throwable] = Registry.all.flatMap { q =>
      try { TestSpark.materialize(q.fn(spark, dir)); None }
      catch { case t: Throwable => Some(q.name -> t) }
    }.toMap
    assert(failures.keySet == Set("q101_gap_fill"),
      s"temporal x skew failure set drifted: " +
        failures.map { case (n, t) =>
          s"$n: ${chain(t).linesIterator.next()}" }.mkString("; "))
    val msg = chain(failures("q101_gap_fill"))
    assert(msg.contains("USER_RAISED_EXCEPTION") &&
      msg.contains("spine exceeds 20 years"),
      s"q101 aborted with the wrong kind under skew: ${msg.take(300)}")
  }

  test("unicode x skew failure set is exactly the designed vocab-guard trio") {
    assume(gate, "set GRAFT_STRESS=1 to run the unicode x skew sweep")
    // Unicode pathology composed ON TOP of the duplicate-key corpus — the
    // last untried pairing of the eight axes. Adjudication BY COUNTED
    // ARITHMETIC, not hope: the organic sf0.001 vocabulary is 31 tokens,
    // SkewFixture.SharedText adds 25 new ones (56 total — why skew alone
    // and temporal × skew never fire the guard), and the unicode 12-token
    // pool pushes the corpus to 68 > 64 — so the q33/q78/q133 bitmask
    // vocabulary guard MUST fire, loudly, exactly as designed (the guard
    // exists to refuse open vocabularies and point at the q50 MinHash/LSH
    // path; a composition that widens the vocabulary past the budget is
    // the guard working, not unicode breaking). Everything else must stay
    // green: pathological TEXT remains a legal VALUE under 10⁵-row
    // mega-keys — NFC/NFD twins, astral pairs, and embedded NULs flow
    // through the skewed shuffles/joins/windows without a single new
    // abort, and the skew mega-user's organic 30-day span keeps q101's
    // spine guard an identity.
    val spark = TestSpark.spark
    val dir = UnicodeFixture.build(spark, SkewFixture.build(spark))
    val failures: Map[String, Throwable] = Registry.all.flatMap { q =>
      try { TestSpark.materialize(q.fn(spark, dir)); None }
      catch { case t: Throwable => Some(q.name -> t) }
    }.toMap
    val vocabTrio =
      Set("q33_neardup_pairs", "q78_dedup_clusters", "q133_dedup_roi")
    assert(failures.keySet == vocabTrio,
      s"unicode x skew failure set drifted from the vocab trio: " +
        failures.map { case (n, t) =>
          s"$n: ${chain(t).linesIterator.next()}" }.mkString("; "))
    vocabTrio.foreach { name =>
      val msg = chain(failures(name))
      assert(msg.contains("vocabulary exceeds 64 words"),
        s"$name aborted with the wrong kind (want the designed vocab " +
          s"guard): ${msg.linesIterator.next()}")
    }
  }
}
