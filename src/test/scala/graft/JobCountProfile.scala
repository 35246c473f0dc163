package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Scheduler-overhead profiler: runs named queries and reports how many
  * Spark JOBS / STAGES / TASKS each one schedules alongside its wall time —
  * run with `sbt "Test/runMain graft.JobCountProfile q133_dedup_roi ..."`
  * (no names = the 25 slowest band entries). Not part of the test suite.
  *
  * Motivation (r19): at sf0.1 every table is ≤11 MB, so per-query wall time
  * is dominated by FIXED costs — Catalyst planning, codegen, broadcast
  * builds, and per-job scheduler round-trips — not by data. A query's job
  * count is the one fixed cost the guide's plan-shape levers (fewer
  * exchanges, reused broadcasts, fewer checkpoint materializations) move
  * directly, so this tool prints it next to the wall time the bench sees.
  */
object JobCountProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTime = new AtomicLong // ms of task run time summed
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTime.addAndGet(t.taskInfo.duration)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "q133_dedup_roi", "q86_ivf_ann", "q50_minhash_lsh",
        "q122_prefix_jaccard_join", "q130_basket_pairs",
        "q51_simhash_neardup", "q125_equi_depth_quintiles",
        "q111_sole_failing_supplier", "q33_neardup_pairs",
        "q03_top_revenue_orders", "q129_pareto_classes", "q123_skew_audit",
        "q114_cohort_retention", "q134_label_separability",
        "q120_curriculum_order", "q112_part_value_share",
        "q119_event_trigrams", "q104_funnel", "q59_returned_items",
        "q60_large_orders", "q74_nation_trade_flows", "q09_set_operations",
        "q124_time_weighted_avg", "q116_inverted_index", "q121_cdc_apply")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(1)
    }
    // Warm-up pass (mirrors Bench): JIT + codegen for the common operator
    // paths so the measured pass isn't charged Janino/C2 compilation of
    // shared infrastructure.
    Seq("q01_pricing_summary", "q03_top_revenue_orders", "q35_word_freq")
      .foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"task_s"}%7s")
    names.foreach { n =>
      SessionCache.invalidateMemoized(spark)
      jobs.set(0); stages.set(0); tasks.set(0); taskTime.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener events are async; give the bus a moment to drain
      // (listenerBus is private[spark] — a fixed sleep is fine for a
      // diagnostic tool).
      Thread.sleep(200)
      println(f"$n%-28s $wall%7.2f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${taskTime.get / 1e3}%7.2f")
    }
  }
}
