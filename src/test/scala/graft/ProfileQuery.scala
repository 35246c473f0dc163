package graft

/** Name-driven warm-repetition profiler — the generic successor to the
  * hand-written per-query mains (ProfileQ33/Q50/Q78/Q122/Q130/Q133) that
  * rounds 8-10 each wrote once to adjudicate a single-query delta.
  *
  *   sbt "Test/runMain graft.ProfileQuery q33_neardup_pairs q133_dedup_roi"
  *   sbt "Test/runMain graft.ProfileQuery --reps=20 --sf=/root/testdata/sf0.01 --fresh q50_minhash_lsh"
  *
  * N warm repetitions per named query; min and median reported, all reps
  * printed. The committed band is a cross-run median, but for an A/B on a
  * single code change the warm MIN is the noise-robust statistic (host
  * drift only ever adds time). Not part of the test suite.
  *
  * Session-cache caveat (same as ProfileQ33's): q133/q78-family queries
  * ride the session-cached cluster relation after their first execution,
  * so under the default shared session only rep 0 measures the build —
  * their warm min is the CACHED path, not band-comparable. Pass `--fresh`
  * to invalidate the memo cache before EVERY rep so each one pays the full
  * pipeline (cache-free queries like q33 are unaffected either way).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    def flag(k: String): Option[String] =
      flags.collectFirst { case f if f.startsWith(s"--$k=") => f.drop(k.length + 3) }
    def usage(problem: String): Nothing = {
      System.err.println(problem +
        "\nusage: Test/runMain graft.ProfileQuery [--reps=N] [--sf=DIR] [--fresh] <query>...\n" +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
    // Malformed or non-positive --reps must reach the usage text, not a
    // raw NumberFormatException / an empty-timings crash after zero reps.
    val reps = flag("reps").map(r => r.toIntOption.getOrElse(usage(s"bad --reps=$r")))
      .getOrElse(10)
    if (reps < 1) usage(s"--reps=$reps must be >= 1")
    val dir = flag("sf").getOrElse("/root/testdata/sf0.1")
    val fresh = flags.contains("--fresh")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (names.isEmpty) usage("no queries named")
    if (unknown.nonEmpty) usage(s"unknown queries: ${unknown.mkString(", ")}")
    val spark = TestSpark.spark
    for (q <- names) {
      val ts = (0 until reps).map { _ =>
        if (fresh) SessionCache.invalidateMemoized(spark)
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = ts.sorted
      // True median (middle-two mean on even counts): the upper-middle
      // element alone biases high under one-sided host-noise inflation —
      // the same silent degradation band_median.py refuses (r9 ADVICE).
      val median =
        if (sorted.size % 2 == 1) sorted(sorted.size / 2)
        else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2
      println(f"[prof] $q%-26s min=${sorted.head}%.3f median=$median%.3f " +
        f"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // No spark.stop(): TestSpark.spark is suite-shared; Test/runMain forks,
    // so JVM exit cleans up (see ProfileQ130 for the rationale).
  }
}
