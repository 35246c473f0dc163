package graft

/** One-off diagnostic: splits a query's warm repetition cost into
  * plan time (analysis+optimization+physical planning, forced via
  * executedPlan) and execution time (count on the already-planned DF).
  * Not part of the suite. `Test/runMain graft.PlanSplitProbe <query>...` */
object PlanSplitProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      val reps = (0 until 8).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        df.queryExecution.executedPlan // force plan
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val ps = reps.map(_._1).sorted
      val es = reps.map(_._2).sorted
      println(f"[split] $q%-26s plan_med=${ps(ps.size / 2)}%.3f " +
        f"exec_med=${es(es.size / 2)}%.3f " +
        f"plans=${reps.map(r => f"${r._1}%.2f").mkString(",")} " +
        f"execs=${reps.map(r => f"${r._2}%.2f").mkString(",")}")
    }
  }
}
