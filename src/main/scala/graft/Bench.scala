package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE compact JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...}
  *
  * `value` is the wall-clock sum over ALL declared queries. The inline
  * "queries" map carries only the 15 slowest (3-decimal seconds) so the
  * whole line stays well under 1 KB — rounds 1-2 proved that a full
  * 79-entry map (~2.7 KB) overflows the driver's tail capture and the line
  * arrives unparseable. Full per-query times go to bench_detail.out.json
  * (same schema, all queries) — an UNTRACKED scratch path, deliberately
  * distinct from the committed quiet band `bench_detail.json`: every bench
  * run (driver or local) used to overwrite the band file in the working
  * tree, leaving host noise one careless `git commit -a` away from becoming
  * the regression denominator (round-8 judge finding). The band file is now
  * only ever written on purpose, via `dev/band_median.py` over 3+ idle
  * samples (protocol in BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: planner warnings (e.g. WindowExec's no-partition
    // notice for the tiny-vocabulary windows) repeat per query and can crowd
    // the driver's bounded tail capture away from the one JSON line.
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed JIT/codegen warm-up on a FIXED set of small queries
    // (deterministic — Map hash order made round-1 warm-up arbitrary).
    // One query is not enough: the first timed join/window/explode query
    // otherwise absorbs the C2-JIT + Janino compile of those whole code
    // paths (q03 measured 2.6 s cold vs ~0.6 s warm on the same host).
    // The set below touches hash/broadcast join, window functions,
    // explode+text, and top-k sort at sf0.001 (~1 s total, untimed), then
    // q01 on the real sfDir so the first timed query doesn't absorb
    // file-listing costs either.
    // q38/q46/q43 extend coverage to the sort_array/md5, higher-order
    // array-function, and vector (graft_dot codegen + embeddings scan)
    // paths — q38 measured 2.4 s on first execution vs 0.45 s warm.
    val warmup = Seq("q01_pricing_summary", "q03_top_revenue_orders",
      "q13_top_orders_per_customer", "q35_word_freq", "q28_sessionization",
      "q38_doc_fingerprint", "q46_array_functions", "q43_cosine_neardup")
    // A failed warm-up must be LOUD (stderr, not the JSON line): the
    // warm-up is load-bearing for the recorded band, so silently skipping
    // it (e.g. the sf0.001 fixture absent on a different host) would shift
    // timed numbers by seconds and read as a code regression.
    val warmupDir = "/root/testdata/sf0.001"
    warmup.foreach { name =>
      try SparkEntry.queries(name)(spark, warmupDir).count()
      catch { case t: Throwable =>
        System.err.println(s"[bench] WARMUP FAILED $name on $warmupDir: ${t.getClass.getSimpleName} — timed numbers will run cold")
      }
    }
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case t: Throwable =>
      System.err.println(s"[bench] WARMUP FAILED q01 on $sfDir: ${t.getClass.getSimpleName}")
    }
    // Deterministic execution order (sorted by name) so per-query times are
    // comparable across rounds.
    // A throwing query records time -1 and lands in the "failed" list —
    // silently recording its time-to-failure would make a fail-fast
    // regression read as a speedup.
    // SPARK_GRAFT_BENCH_VERBOSE=1: per-query start markers on stderr, for
    // correlating log events (e.g. a DAGScheduler ERROR) with the query
    // that triggered them. Off by default — the driver's tail capture is
    // bounded and the one JSON line must stay inside it.
    val verbose = sys.env.get("SPARK_GRAFT_BENCH_VERBOSE").contains("1")
    val runs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (verbose) System.err.println(s"[bench] start $name")
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val results = runs.map { case (n, t, _) => n -> t }
    val failed = runs.collect { case (n, _, false) => n }
    // Locale.ROOT: a comma-decimal default locale would print 61,234 and
    // break the driver's JSON parse of the one line that matters.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => "\"" + k + "\":" + sec(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val slowest = results.sortBy(-_._2).take(15)
    // Always carry n_ok/n_failed: round 6's partial total (116 of 134 ran)
    // was read as a full-suite number because nothing on the line said
    // otherwise. A partial sum must be impossible to mistake for a full one.
    val counts = s""","n_ok":${runs.count(_._3)},"n_failed":${failed.size}"""
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    try {
      val w = new java.io.PrintWriter("bench_detail.out.json")
      w.println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":${fmt(results)}$counts$failedJson,"sf":"$sfDir"}""")
      w.close()
    } catch { case _: Throwable => () }
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":${fmt(slowest)}$counts$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
