package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the decision-support/retention batch (q111–q115) beyond
  * the DuckDB oracle, plus the plan shapes the scale story depends on. */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) =
    Registry.queries(name)(spark, TestSpark.sf0001)

  test("q111: one pass over lineitem — no self-join, supplier broadcasts") {
    val df = run("q111_sole_failing_supplier")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "supplier dim must broadcast")
    // The Q21 rewrite's whole point: lineitem is scanned once, not probed
    // per-row by two correlated EXISTS.
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 2, s"expect exactly lineitem + supplier scans, got $scans")
    df.collect().foreach { r =>
      assert(r.getLong(2) >= 1L, s"numwait must be positive: $r")
    }
  }

  test("q112: shares are a proper partial decomposition of the total") {
    val rows = run("q112_part_value_share").collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(2))
    // >= with half-ulp-of-scale-6 slack: a just-above-threshold share can
    // round DOWN to exactly 0.000500 through DECIMAL(38,6) and still be a
    // correctly kept row (the query's filter is exact integer math).
    assert(shares.forall(s => s >= 1.0 / 2000 - 5e-7 && s <= 1.0),
      "every kept part meets the threshold share up to output rounding")
    // Each share rounds through DECIMAL(38,6) — allow half-ulp-of-scale-6
    // rounding per row on the sum bound.
    assert(shares.sum <= 1.0 + shares.length * 5e-7,
      "kept shares cannot exceed the whole")
  }

  test("q113: histogram partitions the orders exactly") {
    val rows = run("q113_value_histogram").collect()
    val nOrders = Tables.read(spark, TestSpark.sf0001, "orders").count()
    assert(rows.map(_.getLong(1)).sum == nOrders, "row conservation")
    val bins = rows.map(_.getLong(0))
    assert(bins.forall(b => b >= 0 && b < 20), "bin index range")
    assert(bins.sorted.sameElements(bins), "sorted by bin")
    // Bin value ranges must not overlap: each bin's hi < next bin's lo.
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) < b.getLong(2),
          s"bin ranges overlap: ${a.getLong(0)} hi=${a.getLong(3)} vs " +
            s"${b.getLong(0)} lo=${b.getLong(2)}")
      case _ =>
    }
  }

  test("q114: offset-0 retention is exactly 1.0 for every cohort") {
    val rows = run("q114_cohort_retention").collect()
    assert(rows.nonEmpty)
    val day0 = rows.filter(_.getLong(1) == 0L)
    assert(day0.nonEmpty, "every cohort has an offset-0 row")
    day0.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"offset 0 must count the whole cohort: $r")
      assert(r.getDouble(4) == 1.0, s"offset-0 retention must be 1.0: $r")
    }
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0,
        s"retention out of (0,1]: $r")
    }
  }

  test("q115: cumulative-unique curve is monotone and lands on the total") {
    val rows = run("q115_cumulative_users").collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(3) >= a.getLong(3), "cum_users monotone")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"new_users <= dau: $r")
    }
    val totalUsers = Tables.events(spark, TestSpark.sf0001)
      .select("user_id").distinct().count()
    assert(rows.last.getLong(3) == totalUsers,
      "curve must converge to the distinct-user total")
    assert(rows.map(_.getLong(2)).sum == totalUsers,
      "every user is new exactly once")
  }

  test("q119: trigram counts conserve against the per-user event totals") {
    val rows = run("q119_event_trigrams").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) > b.getLong(1) ||
          (a.getLong(1) == b.getLong(1) &&
            a.getString(0) < b.getString(0)), "ordered by (n desc, trigram)")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getString(0).count(_ == '>') == 2, s"three steps: $r")
      assert(r.getLong(1) >= 1L)
    }
    // Total trigram mass across ALL trigrams (not just top 20) is
    // sum(max(0, events_per_user - 2)).
    val expected = Tables.events(spark, TestSpark.sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(sum(greatest(col("n") - 2L, lit(0L)))).head().getLong(0)
    // Re-derive without the limit: the declared query's limit(20) is
    // presentation, the conservation law is about the aggregate beneath it.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val totalTrigrams = Tables.events(spark, TestSpark.sf0001)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .count()
    assert(totalTrigrams == expected, "trigram conservation")
    assert(rows.map(_.getLong(1)).sum <= expected)
  }

  test("q124: TWAP lies within each user's value range and spans first-to-last") {
    val rows = run("q124_time_weighted_avg").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, TestSpark.sf0001)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("us").as("first_us"),
        max("us").as("last_us"), min("cents").as("min_c"),
        max("cents").as("max_c"))
      .collect().map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      val u = ev(r.getLong(0))
      assert(r.getLong(1) == u.getLong(1) - 1, s"intervals = events - 1: $r")
      assert(r.getLong(2) == u.getLong(3) - u.getLong(2),
        s"span = last - first: $r")
      // A convex combination of held values cannot leave their range
      // (half-ulp slack for the DECIMAL(38,6) output rounding).
      assert(r.getDouble(3) >= u.getLong(4) - 5e-7 &&
        r.getDouble(3) <= u.getLong(5) + 5e-7,
        s"TWAP outside the user's value range: $r vs $u")
    }
  }

  test("q125: quintiles partition the orders with near-equal depth, no global sort") {
    val df = run("q125_equi_depth_quintiles")
    val p = df.queryExecution.executedPlan.toString
    // The rank window must partition by the pre-bucket bin — the whole
    // point is that no corpus-sized single-partition sort exists. The only
    // allowed SinglePartition exchanges: the 64-row bin-count scan and the
    // 4-row boundary collect.
    assert(p.contains("hashpartitioning(bin"),
      s"rank window must partition by bin:\n$p")
    val rows = df.collect()
    val n = Tables.read(spark, TestSpark.sf0001, "orders").count()
    assert(rows.map(_.getLong(1)).sum == n, "row conservation")
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length),
      "contiguous quintile ids")
    // Value ranges must be disjoint and ordered.
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) <= b.getLong(2),
          s"quintile ranges must not overlap: $a vs $b")
      case _ =>
    }
    // Depth balance: within ties' tolerance, each quintile holds ~n/5.
    // The fixture's cents values are near-unique, so allow 5% slack.
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - n / 5.0) <= n * 0.05,
        s"quintile depth far from n/5: $r")
    }
  }

  test("q128: streak accounting conserves active days") {
    val rows = run("q128_activity_streaks").collect()
    assert(rows.nonEmpty)
    val totalActive = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct().count()
    assert(rows.map(_.getLong(3)).sum == totalActive,
      "sum of active_days = distinct (user, day)")
    rows.foreach { r =>
      val (nStreaks, longest, active) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(longest >= 1L && longest <= active, s"longest within range: $r")
      assert(nStreaks >= 1L && nStreaks <= active, s"streak count range: $r")
      // n_streaks streaks of >= 1 day each, one of them `longest` long.
      assert(longest + (nStreaks - 1) <= active,
        s"streak lengths must fit in active days: $r")
    }
  }

  test("q129: ABC classes partition revenue at the declared boundaries") {
    val df = run("q129_pareto_classes")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bin"),
      s"running share must use per-bin windows, not a global sort:\n$p")
    val rows = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("A", "B", "C"))
    val nParts = Tables.read(spark, TestSpark.sf0001, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum == nParts, "part conservation")
    val shares = rows.view.mapValues(_._3)
    // A ends at <= 80% cumulative, A+B at <= 95%; each class is the span
    // between boundaries, so A's share can reach 80 but not exceed it, and
    // the three shares sum to 1 (rounding slack).
    assert(shares("A") <= 0.80 + 5e-7 && shares("A") + shares("B") <= 0.95 + 1e-6)
    assert(math.abs(shares.values.sum - 1.0) < 2e-6, "shares sum to 1")
    // A holds the HIGHEST-value parts, so its average value is >= the
    // overall average: its part-count fraction cannot exceed its revenue
    // share (holds for any value distribution — the synthetic fixture is
    // near-uniform, so no stronger "few parts" Pareto claim is sound).
    assert(rows("A")._1.toDouble / nParts <= shares("A") + 1e-6,
      "class A part fraction must not exceed its revenue share")
  }

  test("q130: basket pairs are canonical, ordered, and support-consistent") {
    val rows = run("q130_basket_pairs").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"canonical pair order: $r")
      assert(r.getLong(2) >= 1L)
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) > b.getLong(2) ||
          (a.getLong(2) == b.getLong(2) &&
            (a.getLong(0) < b.getLong(0) ||
              (a.getLong(0) == b.getLong(0) && a.getLong(1) < b.getLong(1)))),
          "ordered by (support desc, pa, pb)")
      case _ =>
    }
    // Cross-check the top pair's support by brute force.
    val (pa, pb, support) =
      (rows.head.getLong(0), rows.head.getLong(1), rows.head.getLong(2))
    val li = Tables.read(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    val expected = li.filter(col("l_partkey") === pa)
      .join(li.filter(col("l_partkey") === pb), "l_orderkey").count()
    assert(support == expected, s"top pair support mismatch: $support vs $expected")
  }

  test("q131: percentiles are ordered and match a brute-force sort") {
    val rows = run("q131_leadtime_percentiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (min_d, p50, p90, max_d) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(min_d <= p50 && p50 <= p90 && p90 <= max_d,
        s"percentile ordering: $r")
    }
    // Brute-force check for one priority: collect, sort, index nearest-rank.
    val pri = rows.head.getString(0)
    val lead = Tables.read(spark, TestSpark.sf0001, "lineitem")
      .join(Tables.read(spark, TestSpark.sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderpriority") === pri)
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    def nearest(p: Int) = lead((p * lead.length + 99) / 100 - 1)
    assert(rows.head.getLong(3) == nearest(50), "p50 brute-force match")
    assert(rows.head.getLong(4) == nearest(90), "p90 brute-force match")
  }

  test("q132: the retention matrix is consistent with q114's long form") {
    val matrix = run("q132_retention_matrix").collect()
      .map(r => r.getDate(0).toString ->
        Map(0L -> r.getLong(1), 1L -> r.getLong(2), 3L -> r.getLong(3),
          7L -> r.getLong(4), 14L -> r.getLong(5))).toMap
    assert(matrix.nonEmpty)
    val long = run("q114_cohort_retention").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    matrix.foreach { case (cohort, cells) =>
      cells.foreach { case (off, n) =>
        assert(n == long.getOrElse((cohort, off), 0L),
          s"matrix[$cohort][$off] = $n disagrees with the long form")
      }
      // d0 is the cohort size: no later offset can exceed it.
      assert(cells.values.forall(_ <= cells(0L)), s"d0 bounds $cohort")
    }
  }

  test("q117: slope/intercept match an independent exact re-derivation") {
    val out = run("q117_daily_trend").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.nonEmpty)
    // Re-derive from the raw events with BigInt arithmetic (a different
    // code path than the query's decimal sums).
    val daily = Tables.events(spark, TestSpark.sf0001)
      .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy("event_type", "day").agg(sum("cents").as("y"))
      .withColumn("x",
        datediff(col("day"), to_date(lit("2024-01-01"))).cast("long"))
      .select("event_type", "x", "y").collect()
      .groupBy(_.getString(0))
    daily.foreach { case (et, rows) =>
      val xs = rows.map(r => BigInt(r.getLong(1)))
      val ys = rows.map(r => BigInt(r.getLong(2)))
      val n = BigInt(rows.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val det = (n * sxx - sx * sx).toDouble
      val slope = (n * sxy - sx * sy).toDouble / det
      val intercept = (sy * sxx - sx * sxy).toDouble / det
      val (nDays, qSlope, qIntercept) = out(et)
      assert(nDays == rows.length, s"$et: day count")
      assert(math.abs(qSlope - slope) < 1e-6, s"$et: slope $qSlope vs $slope")
      assert(math.abs(qIntercept - intercept) < 1e-6,
        s"$et: intercept $qIntercept vs $intercept")
    }
  }
}
