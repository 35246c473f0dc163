package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** One-off diagnostic: prints every Spark JOB a query schedules (job id,
  * first-stage name = the call site that materialized it, stage count,
  * total tasks) so a query's job budget can be itemized — the r20 lever
  * is whole-job elimination, and this answers "which 16 jobs?" directly.
  * `sbt "Test/runMain graft.JobTraceProbe q50_minhash_lsh"`. Not part of
  * the test suite. */
object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    @volatile var active = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (active) {
        val head = j.stageInfos.sortBy(_.stageId).lastOption
        val tasks = j.stageInfos.map(_.numTasks).sum
        println(f"[jobtrace] job=${j.jobId}%3d stages=${j.stageIds.size}%2d " +
          f"tasks=$tasks%4d  ${head.map(_.name).getOrElse("?").take(110)}")
      }
    })
    // Bench-style warm-up so JIT/codegen noise doesn't add retry jobs.
    Seq("q01_pricing_summary", "q03_top_revenue_orders", "q35_word_freq")
      .foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    args.foreach { q =>
      SessionCache.invalidateMemoized(spark)
      println(s"[jobtrace] ==== $q ====")
      active = true
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      active = false
      println(f"[jobtrace] wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(300)
    }
  }
}
