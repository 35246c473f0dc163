package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Builder for the NON-FINITE double corpus — [[NonFiniteInputSpec]]'s
  * fixture: the sixth input-robustness axis. The five existing axes poison
  * structure (zero rows, null values), vector shape (degenerate
  * embeddings), scalar magnitude (boundary), and key distribution (skew);
  * none plants IEEE special values in the SCALAR double columns. A 100 TB
  * feed delivers them routinely — an upstream 0/0 emits NaN, an overflowed
  * ratio emits ±Inf, and parquet stores all three as ordinary doubles, so
  * they arrive in-schema (FIXTURES.md leaves `value`'s domain
  * unconstrained).
  *
  * Why this class is its own axis and not more boundary magnitudes:
  * non-finite doubles CORRUPT SILENTLY through ordering and aggregation —
  * Spark evaluates `NaN > t` as TRUE and sorts NaN above every double, so
  * a NaN row sails through range filters and tops every max/rank; a
  * single ±Inf pair yields Inf−Inf = NaN deep inside an otherwise-finite
  * aggregate. The engine's designed defense is the SHARED CAST POINT:
  * every scalar money/value consumer derives integer cents or a
  * DECIMAL(p,s) through `Tables.eventsUs` / `Q.dec2/dec4`, and under the
  * shipping ANSI config a non-finite double cast to integral/decimal
  * fails LOUD — symmetrically with the DuckDB oracle, whose same casts
  * raise Conversion/InvalidInput errors (probed: dev/oracle_probe.py pin
  * groups 5–6). [[NonFiniteInputSpec]] proves the defense covers ALL
  * consumers
  * (set-equality over the full registry) and that Catalyst's column
  * pruning keeps non-consumers byte-identical.
  *
  * Poisoned columns (one mod-class per special value, organic elsewhere;
  * sf0.001 scale — ~1–10 rows per class, enough to reach every aggregate
  * without reshaping distributions):
  *   - events.value:          event_id % 101 = 0→NaN, 1→+Inf, 2→−Inf
  *   - lineitem.l_extendedprice: l_orderkey % 97 = 0→NaN, 1→+Inf, 2→−Inf
  *   - lineitem.l_tax:        l_orderkey % 97 = 3 → NaN
  *   - lineitem.l_discount:   l_orderkey % 97 = 4 → +Inf
  *   - lineitem.l_quantity:   l_orderkey % 97 = 5 → NaN
  *   - customer.c_acctbal:    c_custkey % 53 = 0→NaN, 1→−Inf
  *   - supplier.s_acctbal:    s_suppkey % 7  = 0 → −Inf
  *   - orders.o_totalprice:   o_orderkey % 89 = 0 → NaN
  *   - part.p_retailprice:    p_partkey % 41 = 0 → NaN
  * — i.e. EVERY scalar double column in the star schema carries at least
  * one non-finite row.
  * Embedding arrays are deliberately NOT poisoned here — non-finite
  * vector elements are [[DegenerateVectorSpec]]'s axis, already pinned.
  */
object NonFiniteFixture {

  val NaNd: Column = lit(Double.NaN)
  val PosInf: Column = lit(Double.PositiveInfinity)
  val NegInf: Column = lit(Double.NegativeInfinity)

  /** Build the corpus under a fresh temp dir; returns the dir. */
  def build(spark: SparkSession): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nonfinite-sf")
      .toString
    val sf = TestSpark.sf0001

    // untouched tables: copied verbatim so every query finds its inputs
    Seq("region", "nation", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    }

    def poison(table: String, keyCol: String, m: Int,
               edits: Seq[(Int, String, Column)]): Unit = {
      val df0 = spark.read.parquet(s"$sf/$table.parquet")
      val k = pmod(col(keyCol), lit(m))
      edits.groupBy(_._2).foldLeft(df0) { case (df, (c, es)) =>
        df.withColumn(c, es.foldLeft(when(lit(false), col(c))) {
          case (w, (cls, _, v)) => w.when(k === cls, v)
        }.otherwise(col(c)))
      }.coalesce(1).write.parquet(s"$dir/$table.parquet")
    }

    poison("events", "event_id", 101, Seq(
      (0, "value", NaNd), (1, "value", PosInf), (2, "value", NegInf)))
    poison("lineitem", "l_orderkey", 97, Seq(
      (0, "l_extendedprice", NaNd), (1, "l_extendedprice", PosInf),
      (2, "l_extendedprice", NegInf),
      (3, "l_tax", NaNd), (4, "l_discount", PosInf),
      (5, "l_quantity", NaNd)))
    poison("customer", "c_custkey", 53, Seq(
      (0, "c_acctbal", NaNd), (1, "c_acctbal", NegInf)))
    poison("supplier", "s_suppkey", 7, Seq((0, "s_acctbal", NegInf)))
    poison("orders", "o_orderkey", 89, Seq((0, "o_totalprice", NaNd)))
    poison("part", "p_partkey", 41, Seq((0, "p_retailprice", NaNd)))

    dir
  }
}

/** The adjudicated loud-abort map for the non-finite corpus — shared by
  * [[NonFiniteInputSpec]] (single axis) and [[StressSweepSpec]]'s
  * three-way pin ([[TriStressFixture]]), so one adjudication list cannot
  * drift from the other. Kind per query: the guard's message
  * ("non-finite double") at double→DECIMAL ingresses, Spark's own
  * CAST_OVERFLOW at the double→BIGINT cents casts. (q103/q112/q129
  * surface as STAGE_MATERIALIZATION_MULTIPLE_FAILURES wrappers; the
  * cause chain carries the kind.) */
object NonFiniteExpectations {
  val expected: Map[String, String] = {
    val raised = Seq(
      "q01_pricing_summary", "q02_predicate_filter", "q03_top_revenue_orders",
      "q04_region_enrichment", "q11_rollup_balances", "q12_cube_lineitem",
      "q79_limit_offset", "q13_top_orders_per_customer",
      "q19_top_parts_per_brand", "q23_acctbal_stats", "q105_topk_aggregate",
      "q30_math_functions", "q31_order_tiers", "q57_shipping_priority",
      "q59_returned_items", "q60_large_orders", "q62_yearly_priority_values",
      "q63_above_brand_average", "q75_promo_revenue_share",
      "q76_disjunctive_predicates", "q77_above_average_customers",
      "q74_nation_trade_flows", "q112_part_value_share", "q129_pareto_classes")
    val cast = Seq(
      "q15_running_totals", "q16_trailing_hour", "q21_value_percentiles",
      "q103_winsorized_stats", "q25_hourly_rollup", "q26_daily_type_breakdown",
      "q27_json_props", "q28_sessionization", "q101_gap_fill",
      "q47_upsert_merge", "q48_lambda_view_union", "q121_cdc_apply",
      "q69_approx_percentiles", "q113_value_histogram", "q117_daily_trend",
      "q124_time_weighted_avg", "q125_equi_depth_quintiles")
    (raised.map(_ -> "non-finite double") ++
      cast.map(_ -> "CAST_OVERFLOW")).toMap
  }
}

/** Materialize the non-finite corpus to a temp dir and print it — the
  * committed entry point for running external harnesses (dev/parity.sh,
  * Verify) on the SAME corpus the spec pins, mirroring SkewFixtureMain. */
object NonFiniteFixtureMain {
  def main(a: Array[String]): Unit = {
    println(s"NONFINITE_FIXTURE_DIR=${NonFiniteFixture.build(TestSpark.spark)}")
  }
}

/** Exploratory sweep: run every registry query on the non-finite corpus
  * and print PASS / the first cause-chain line per query — the
  * adjudication input for [[NonFiniteInputSpec]]'s expected-failure set.
  * Not part of the suite; run with
  * `sbt "Test/runMain graft.NonFiniteSweepMain"`. */
object NonFiniteSweepMain {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = NonFiniteFixture.build(spark)
    println(s"[nonfinite] corpus at $dir")
    Registry.all.foreach { q =>
      val r = try { TestSpark.materialize(q.fn(spark, dir)); "PASS" }
      catch {
        case t: Throwable =>
          val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
            .map(_.toString.linesIterator.next()).mkString(" | ")
          s"FAIL ${chain.take(300)}"
      }
      println(f"[nonfinite] ${q.name}%-28s $r")
    }
  }
}
