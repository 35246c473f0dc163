package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * All tables are plain parquet scans except `events`: its `ts` column's
  * physical encoding is driver-controlled and has already changed once
  * mid-round (2026-08-13: TIMESTAMP(NANOS) → naive timestamp[us]).
  * `normalizeEventTs` absorbs every encoding seen so far into one canonical
  * form — µs-precision `TimestampType` whose epoch value equals DuckDB's
  * read of the same column — so query code never sees the difference.
  * `FixtureSchemaSpec` is the canary: a THIRD encoding fails one test with a
  * pointed message instead of 18 scattered query failures (round-6 lesson).
  */
object Tables {
  val star: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = star ++ Seq("events", "documents", "embeddings")

  /** Memoized per (session, dir, table): `spark.read.parquet` eagerly lists
    * the directory and reads a footer for the schema on EVERY call, and a
    * 134-query run re-reads each table dozens of times. Reusing the
    * DataFrame reuses its file index and schema — part of the per-query
    * fixed-cost floor the round-4 bench identified. Queries only apply
    * transformations on top (never mutate), so sharing the relation is
    * safe; datasets are immutable per path (SessionCache contract). */
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.SessionCache.getOrBuild(spark, s"table:$dir/$name") {
      name match {
        case "events"     => events(spark, dir)
        case "embeddings" => embeddingsClean(spark, dir)
        case t            => spark.read.parquet(s"$dir/$t.parquet")
      }
    }

  /** The embeddings corpus with degenerate vectors excluded at the source —
    * the vector-space twin of [[normalizeEventTs]]: ONE sanitation point so
    * no query ever sees a vector that defines no cosine.
    *
    * A vector is degenerate when it is null, contains a non-finite element,
    * or has zero norm. All three reach the same failure through plain
    * arithmetic: cos = dot/(‖a‖·‖b‖) becomes 0/0 or NaN/Inf, and Spark's
    * double semantics then turn corruption SILENT — NaN sorts above every
    * double (a corrupt vector tops every descending rank) and `NaN > t` is
    * TRUE (it passes every near-dup threshold) — or LOUD under ANSI (the
    * zero vector's 0/0 raises DIVIDE_BY_ZERO; DegenerateVectorSpec recorded
    * q43/q44/q52/q86 crashing before this gate existed).
    *
    * The predicate is graft_vec_ok (plans.VectorDefined): ONE fused
    * squared-norm pass per row — `d² = Σx²` is NaN iff any element is NaN,
    * +Inf iff any element overflows, and 0 iff the vector is all-zero — and
    * by Cauchy–Schwarz a finite positive norm on both sides bounds every
    * downstream cosine inside [-1, 1], so ONE scan-level filter makes every
    * ranking, threshold, and decimal cast in the vector surface total.
    * (A first formulation composed three graft_dot comparisons; q52's
    * plane-literal plans run with whole-stage codegen disabled, where no
    * subexpression elimination exists, and the re-evaluated dots cost a
    * measured +0.7 s warm median — hence the dedicated expression.)
    * Fixture impact: zero — all three fixture scales carry no degenerate
    * vectors (verified; pinned by DegenerateVectorSpec's clean-fixture
    * test), so declared results are unchanged. At 100 TB the gate is a
    * per-row scan predicate (no shuffle, no state) — exactly where a
    * corrupt-embedding quarantine belongs. */
  def embeddingsClean(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.VectorFunctions.register(spark)
    // The explicit isNotNull is redundant with graft_vec_ok's null
    // intolerance but reaches the parquet reader as a pushed filter
    // (row-group pruning on null pages); the custom predicate cannot.
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("embedding").isNotNull && expr("graft_vec_ok(embedding)"))
  }

  /** The ONE ts normalization shared by the batch reader and the streaming
    * replay (StreamingOps.fileReplay): the lambda parity guarantee
    * (replay ≡ batch) depends on both paths using this exact expression —
    * never inline a copy. Encodings handled:
    *
    *   - `LongType`: the pre-2026-08-13 fixture was parquet TIMESTAMP(NANOS),
    *     which Spark 4.1.2 rejects unless
    *     `spark.sql.legacy.parquet.nanosAsLong` is set (we set it); the
    *     column then arrives as ns-since-epoch longs → truncate to µs,
    *     matching DuckDB's own ns→µs truncation.
    *   - `TimestampNTZType`: the regenerated fixture is naive timestamp[us].
    *     Reinterpreted as a UTC instant via `make_timestamp(..., 'UTC')`
    *     over the NTZ field extractions — every one of which is
    *     zone-independent — so the epoch µs equal DuckDB's naive read in
    *     ANY session timezone, and reading `events` never mutates session
    *     conf (a plain NTZ→Timestamp cast captures the session zone at
    *     analysis time; the earlier fix pinned the zone by flipping
    *     `spark.sql.session.timeZone` as a read side effect, which leaked
    *     into every later query of a non-UTC user session — round-7 judge
    *     finding). `FixtureSchemaSpec` pins both contracts.
    *   - `TimestampType`: already canonical (re-materialized copies, e.g.
    *     ScaleCheck's 10× replica) — pass through.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr(
          "make_timestamp(year(ts), month(ts), day(ts), hour(ts), " +
            "minute(ts), date_part('SECOND', ts), 'UTC')"))
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — the driver fixture " +
        "changed encoding again. Supported: ns-long (legacy TIMESTAMP(NANOS) " +
        "via nanosAsLong), TIMESTAMP_NTZ µs, TIMESTAMP. Teach " +
        "Tables.normalizeEventTs (ONE place) and FixtureSchemaSpec the new " +
        "encoding.")
    }

  /** Conf key the legacy nanos shim needs (consulted at scan planning time;
    * a no-op against the current µs fixture, kept for back-compat). */
  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Raw events scan — schema exactly as the parquet footer declares it,
    * BEFORE ts normalization. Memoized separately from the normalized
    * `events` because the streaming replay (StreamingOps.fileReplay) needs
    * this raw schema to declare its source, and an un-memoized footer read
    * per `fileReplay` call was a repeated eager directory-list+footer cost
    * (round-7 ADVICE).
    *
    * The legacy-nanos shim conf is scoped to the footer read and restored
    * (round-8 ADVICE — same class of read side effect as the r7 timeZone
    * finding: a user session that deliberately set it false was getting it
    * silently flipped, and only on cache miss). ONE documented exception:
    * when the footer genuinely declares TIMESTAMP(NANOS) — `ts` arrives as
    * LongType — the flag must STAY set, because the scan re-consults it at
    * execution time; reading a legacy fixture is the only path that
    * mutates session conf, and FixtureSchemaSpec pins that the current µs
    * fixture leaves the conf untouched. */
  /** Serializes the save/set/restore of the nanos shim conf: SessionCache
    * builds are deliberately unlocked, so two threads racing the first
    * `eventsRaw` build could each capture the other's transient "true" as
    * `prev` and leave the flag flipped (round-9 ADVICE; latent — the
    * engine runs queries sequentially — but a lock is cheaper than the
    * assumption). Global, not per-session: the build is a once-per-
    * (session, dir) footer read, contention is nil. */
  private val nanosShimLock = new Object

  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(spark, s"table:$dir/events.raw") {
      nanosShimLock.synchronized {
        val prev = spark.conf.getOption(NanosAsLongConf)
        def restore(): Unit = prev match {
          case Some(v) => spark.conf.set(NanosAsLongConf, v)
          case None    => spark.conf.unset(NanosAsLongConf)
        }
        spark.conf.set(NanosAsLongConf, "true")
        // The schema("ts") probe sits INSIDE the try (round-9 ADVICE): on a
        // fixture without a ts column it throws IllegalArgumentException,
        // and the conf must be restored before that propagates — leaving
        // the shim flipped on the error path is exactly the read
        // side-effect leak this scoping exists to close.
        try {
          val df = spark.read.parquet(s"$dir/events.parquet")
          if (df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
            restore()
          df
        } catch { case t: Throwable => restore(); throw t }
      }
    }

  /** `events` with `ts` as a µs-precision timestamp (see object doc). */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(eventsRaw(spark, dir))

  /** events + epoch-µs `us` + exact integer `cents` — the projection every
    * event-time query builds on. Round 6: this 2-line derivation was
    * copy-pasted into five operator files, so the fixture's ts-encoding
    * change needed five edits and got zero; ONE definition here means the
    * next change needs one. Memoized like `read` (dozens of queries per
    * run re-derive it). */
  def eventsUs(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(spark, s"table:$dir/events.us") {
      read(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
    }

}
