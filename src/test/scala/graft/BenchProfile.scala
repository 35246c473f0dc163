package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Bench-faithful warm-repetition profiler. Unlike [[ProfileQuery]] (which
  * rides TestSpark's local[4]/4-partition suite session), this builds the
  * EXACT session Bench.main builds — master local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=cpus, ANSI pinned — so warm-rep minima are directly
  * comparable to committed-band entries, and per-rep job/stage/task counts
  * expose the scheduler-overhead share of each query's wall time.
  *
  *   sbt "Test/runMain graft.BenchProfile q130_basket_pairs q133_dedup_roi"
  *   SPARK_GRAFT_CPUS=16 sbt "Test/runMain graft.BenchProfile --reps=7 --fresh q130_basket_pairs"
  *
  * --fresh invalidates the session memo cache before every rep (the
  * ProfileQuery caveat: q78/q133-family queries otherwise ride the cached
  * cluster relation after rep 0). Not part of the test suite.
  *
  * --ab=key=value runs an interleaved A/B: even reps on the session
  * default, odd reps with the session conf set — both arms share one JVM
  * (same JIT/codegen state, same host window), which removes the
  * run-to-run variance that made separate-JVM A/Bs unreadable (three
  * "default" samples of q01 read 0.395/0.459/0.631 med across JVMs).
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    def flag(k: String): Option[String] =
      flags.collectFirst { case f if f.startsWith(s"--$k=") => f.drop(k.length + 3) }
    val reps = flag("reps").map(_.toInt).getOrElse(7)
    val fresh = flags.contains("--fresh")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (names.isEmpty || unknown.nonEmpty) {
      System.err.println(s"unknown or missing queries: ${unknown.mkString(", ")}")
      sys.exit(1)
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled",
        sys.props.getOrElse("spark.sql.ansi.enabled", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTime = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTime.addAndGet(t.taskInfo.duration)
        ()
      }
    })
    // Bench's exact warm-up set.
    Seq("q01_pricing_summary", "q03_top_revenue_orders",
      "q13_top_orders_per_customer", "q35_word_freq", "q28_sessionization",
      "q38_doc_fingerprint", "q46_array_functions", "q43_cosine_neardup")
      .foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    val ab = flag("ab").map { kv =>
      val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
    }
    // Arm A must restore the value the SESSION was built with, not Spark's
    // global default (r19 ADVICE #4): unset() on a builder-pinned key
    // (spark.sql.shuffle.partitions, spark.sql.ansi.enabled) would run arm
    // A with the wrong baseline and mis-measure the comparison.
    val abBaseline = ab.map { case (k, _) => spark.conf.getOption(k) }
    def restoreA(k: String): Unit = abBaseline.flatten match {
      case Some(orig) => spark.conf.set(k, orig)
      case None => spark.conf.unset(k)
    }
    names.foreach { q =>
      val samples = (0 until (if (ab.isDefined) reps * 2 else reps)).map { i =>
        val armB = ab.isDefined && i % 2 == 1
        ab.foreach { case (k, v) =>
          if (armB) spark.conf.set(k, v) else restoreA(k)
        }
        if (fresh) SessionCache.invalidateMemoized(spark)
        jobs.set(0); tasks.set(0); taskTime.set(0)
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        (wall, jobs.get, tasks.get, taskTime.get / 1e3, armB)
      }
      ab.foreach { case (k, _) => restoreA(k) }
      def line(tag: String, ss: Seq[(Double, Int, Int, Double, Boolean)]): Unit = {
        val walls = ss.map(_._1).sorted
        val med = walls(walls.size / 2)
        println(f"[bprof] $q%-28s$tag min=${walls.head}%6.3f med=$med%6.3f " +
          f"jobs=${ss.last._2}%3d tasks=${ss.last._3}%5d task_s=${ss.last._4}%7.2f " +
          f"all=${ss.map(s => f"${s._1}%.2f").mkString(",")}")
      }
      if (ab.isDefined) {
        // Drop each arm's first sample: rep 0 carries first-touch costs
        // (codegen, file listing) that would bias arm A.
        line(" A", samples.filter(!_._5).drop(1))
        line(" B", samples.filter(_._5).drop(1))
      } else line("", samples)
    }
    spark.stop()
  }
}
