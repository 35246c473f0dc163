package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2: H2 (date/time), H4 (conditional), H7 (JSON), I9 (batch
  * sessionization) over the `events` stream table — the lambda batch layer
  * recomputing views over the event log. Timestamps are projected as
  * epoch-µs bigints or DATE casts, never raw timestamps (SURVEY §7.4). */
object EventQueries {

  // Shared in Tables so a fixture dtype change is a one-file edit (round 6).
  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(s, dir)

  private val oracleEventsUs =
    """SELECT user_id, event_id, event_type, props, ts, epoch_us(ts) AS us,
      |       CAST(ROUND(value*100) AS BIGINT) AS cents FROM events""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    // ---- H2: event-time truncation → hourly batch view ----
    QueryDef(
      "q25_hourly_rollup",
      (s, dir) =>
        eventsUs(s, dir)
          .withColumn("hour_us", unix_micros(date_trunc("hour", col("ts"))))
          .groupBy("hour_us")
          // Cents sums over a TIME slice are corpus-linear (an hour/day/
          // bucket legally holds any corpus fraction — the q117 argument)
          // and cents is sign-mixed, so a BIGINT running sum can abort
          // (ANSI) on a prefix even when the final value fits — while the
          // oracle's SUM(BIGINT) rides int128 and only its final BIGINT
          // cast gates. Accumulate in DECIMAL(38,0) like the oracle; the
          // BIGINT output cast is the declared contract, loud beyond 2^63
          // on both sides identically (r17 cast-width audit; q129's
          // internal-accumulator adjudication). Same widen: q26, q27,
          // q28, q15, q16, q48, q113.
          .agg(count(lit(1)).as("n"),
            sum(col("cents").cast("decimal(38,0)")).cast("long").as("cents"),
            countDistinct(col("user_id")).as("users"))
          .orderBy("hour_us"),
      Some(s"""
        SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents,
               COUNT(DISTINCT user_id) AS users
        FROM ($oracleEventsUs)
        GROUP BY hour_us
        ORDER BY hour_us
      """.stripMargin.trim)),

    // ---- H2 + H4: daily view with conditional (CASE) measures ----
    QueryDef(
      "q26_daily_type_breakdown",
      (s, dir) =>
        eventsUs(s, dir)
          .withColumn("day", date_trunc("day", col("ts")).cast("date"))
          .groupBy("day")
          .agg(
            count(lit(1)).as("n"),
            // DECIMAL(38,0) accumulator, BIGINT output contract — see q25.
            sum(when(col("event_type") === "purchase", col("cents")).otherwise(0)
              .cast("decimal(38,0)")).cast("long").as("purchase_cents"),
            count(when(col("event_type") === "error", lit(1))).as("errors"),
            count(when(col("event_type") === "signup", lit(1))).as("signups"),
            sum(when(col("event_type").isin("click", "view"), 1).otherwise(0))
              .as("engagement"))
          .orderBy("day"),
      Some(s"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT)
                 AS purchase_cents,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
               CAST(SUM(CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END) AS BIGINT)
                 AS engagement
        FROM ($oracleEventsUs)
        GROUP BY day
        ORDER BY day
      """.stripMargin.trim)),

    // ---- H7: JSON property extraction from the semi-structured column ----
    QueryDef(
      "q27_json_props",
      (s, dir) =>
        eventsUs(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          // `/` on longs is DOUBLE division in BOTH engines (DuckDB `/` is
          // float too), so the bucket is the floor of the IDENTICAL double
          // on both sides at any k; past 2^53 the division itself is the
          // (shared, symmetric) precision bound — an off-by-one BUCKET at
          // |k| ≳ 9e15, never an engine split (r17 cast-width audit).
          .withColumn("k_bucket", floor(col("k") / 10).cast("long"))
          .groupBy("k_bucket")
          // DECIMAL(38,0) accumulator, BIGINT output contract — see q25.
          .agg(count(lit(1)).as("n"),
            sum(col("cents").cast("decimal(38,0)")).cast("long").as("cents"),
            countDistinct(col("k")).as("distinct_k"))
          .orderBy("k_bucket"),
      Some(s"""
        SELECT CAST(FLOOR(CAST(json_extract_string(props, '$$.k') AS BIGINT) / 10) AS BIGINT)
                 AS k_bucket,
               COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents,
               COUNT(DISTINCT CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS distinct_k
        FROM ($oracleEventsUs)
        GROUP BY k_bucket
        ORDER BY k_bucket
      """.stripMargin.trim)),

    // ---- H6 + H7: from_json → struct field access, struct(), map lookup.
    // Struct/map values stay out of the FINAL projection (SURVEY §7.4 rule
    // 7) — only scalar fields extracted from them are emitted. ----
    QueryDef(
      "q56_json_struct",
      (s, dir) =>
        eventsUs(s, dir)
          .withColumn("parsed",
            // k BIGINT, not INT: from_json's permissive mode silently NULLs
            // a field that overflows its declared type, so "k INT" turned
            // every legal JSON integer past 2^31 into NULL while the
            // oracle's CAST(... AS BIGINT) carried the value — a silent
            // hash split on a legal corpus (r17 cast-width audit; pinned
            // by BoundaryInputSpec's big-k corpus). BIGINT matches the
            // oracle's parse width; k*2 below overflows LOUD at >2^62 on
            // both sides identically.
            from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
          .withColumn("k", col("parsed").getField("k").cast("long"))
          .withColumn("tagged", struct(col("event_type").as("t"), col("user_id").as("u")))
          .withColumn("m", map(lit("base"), col("k"), lit("double"), col("k") * 2))
          .select(
            col("event_id"),
            col("k"),
            col("tagged").getField("t").as("type_from_struct"),
            element_at(col("m"), "double").as("k_doubled"))
          .orderBy("event_id"),
      Some(s"""
        SELECT event_id,
               CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
               event_type AS type_from_struct,
               CAST(json_extract_string(props, '$$.k') AS BIGINT) * 2 AS k_doubled
        FROM ($oracleEventsUs)
        ORDER BY event_id
      """.stripMargin.trim)),

    // ---- I9: batch sessionization (30-min inactivity gap) — the lambda
    // speed-layer staple recomputed over the full log. lag → flag → running
    // sum gives a per-user session id in one shuffle. ----
    QueryDef(
      "q28_sessionization",
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        eventsUs(s, dir)
          .withColumn("prev_us", lag(col("us"), 1).over(wOrd))
          .withColumn("new_s",
            when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("new_s")).over(wRun))
          .groupBy("user_id", "session_id")
          // A session's row count is unbounded (the skew axis's mega-user
          // holds half the corpus in one) — DECIMAL(38,0) accumulator,
          // BIGINT output contract, see q25.
          .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"),
            max(col("us")).as("end_us"),
            sum(col("cents").cast("decimal(38,0)")).cast("long").as("cents"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""
        WITH e AS ($oracleEventsUs),
        g AS (
          SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
          FROM e
        ),
        f AS (
          SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                         THEN 1 ELSE 0 END AS new_s
          FROM g
        ),
        sess AS (
          SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_id
          FROM f
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
      """.stripMargin.trim)),

    // ---- Time-series gap fill + forward fill: regularize the ragged event
    // stream onto a per-user hourly spine (generated, not stored), carrying
    // the last observed measure across empty hours — the standard
    // feature-store / metrics-backfill reshape.
    //
    // Pieces: per-(user, hour) "last observation" picked deterministically
    // by (us, event_id) — max_by over a struct key here, QUALIFY
    // row_number()=1 in the oracle (DuckDB's arg_max cannot take composite
    // keys); a generated hourly spine (sequence/generate_series — a
    // generator, no stored calendar table); LEFT join back; then
    // last(..., ignoreNulls) over a user-partitioned running frame.
    //
    // Scale: the spine is |users| × |hours| (generated in-executor, never
    // shuffled raw events); joins and the fill window all partition by
    // user_id — no global window, no skew beyond per-user activity. The
    // fill is never null: each user's spine starts at their own first
    // event hour. ----
    QueryDef(
      "q101_gap_fill",
      (s, dir) => {
        val e = eventsUs(s, dir)
          .withColumn("hour", date_trunc("hour", col("ts")))
        val hourly = e.groupBy(col("user_id"), col("hour"))
          .agg(count(lit(1)).as("n_events"),
            max_by(col("cents"), struct(col("us"), col("event_id")))
              .as("last_cents"))
        val spine = e.groupBy("user_id")
          .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
          // Runtime tripwire (r18 temporal axis), zero extra jobs: this is
          // the engine's ONLY data-extent-driven generated dimension —
          // sequence() materializes (h1−h0) hourly rows PER USER, so one
          // corrupted far-past/future timestamp (year 0001/9999 arrives
          // in-schema from any upstream s/ms/µs unit confusion) would
          // materialize ~87.6M spine rows for that user. The oracle's
          // generate_series explodes IDENTICALLY — symmetry is no defense
          // when the failure mode is an OOM'd stage, not a wrong value.
          // Bound the backfill window loudly: 20 years of hourly spine
          // (175,320 rows/user, vs the 30-day organic domain) is generous
          // for a metrics backfill; beyond it fail with instructions, like
          // the q33 64-word vocabulary guard. The h0-IS-NULL screen (r18
          // ADVICE): a user whose every ts is NULL has NULL h0/h1, and
          // assert_true THROWS on a NULL condition — which would turn the
          // pre-guard semantics (sequence(NULL,..) → NULL → explode drops
          // the user silently) into a whole-query abort at real ingress.
          // NULL extents are not a corrupt-magnitude signal, so they pass
          // the guard and keep the original drop-the-user behavior.
          .filter(expr("ifnull(assert_true(h0 IS NULL OR " +
            "unix_micros(h1) - unix_micros(h0)" +
            " <= 631152000000000, 'gap-fill spine exceeds 20 years for a " +
            "user: a timestamp is likely corrupt (far-past/future); clamp " +
            "the observation window upstream or raise the q101 spine cap')" +
            ", true)"))
          .select(col("user_id"),
            explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
        val w = Window.partitionBy("user_id").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(hourly, Seq("user_id", "hour"), "left")
          .withColumn("filled_cents",
            last(col("last_cents"), ignoreNulls = true).over(w))
          .select(col("user_id"), unix_micros(col("hour")).as("hour_us"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            col("filled_cents"))
          .orderBy("user_id", "hour_us")
      },
      Some(s"""
        WITH e AS (
          SELECT *, date_trunc('hour', ts) AS hour FROM ($oracleEventsUs)
        ),
        hourly AS (
          SELECT user_id, hour, n_events, cents AS last_cents FROM (
            SELECT user_id, hour, cents,
                   COUNT(*) OVER (PARTITION BY user_id, hour) AS n_events,
                   ROW_NUMBER() OVER (PARTITION BY user_id, hour
                                      ORDER BY us DESC, event_id DESC) AS rn
            FROM e) WHERE rn = 1
        ),
        spine AS (
          SELECT user_id,
                 UNNEST(generate_series(MIN(hour), MAX(hour), INTERVAL 1 HOUR))
                   AS hour
          FROM e GROUP BY user_id
        )
        SELECT s.user_id, epoch_us(s.hour) AS hour_us,
               COALESCE(h.n_events, 0) AS n_events,
               last_value(h.last_cents IGNORE NULLS)
                 OVER (PARTITION BY s.user_id ORDER BY s.hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS filled_cents
        FROM spine s LEFT JOIN hourly h
          ON s.user_id = h.user_id AND s.hour = h.hour
        ORDER BY s.user_id, hour_us
      """.stripMargin.trim)),

    // ---- Funnel analysis: signup → click → purchase, strictly ordered in
    // event time per user. Each stage is "first qualifying event after the
    // previous stage's time": a per-user min-aggregate joined forward into
    // the next stage's filter — successive key-joins that only ever narrow,
    // the standard distributed funnel plan (no window over whole history,
    // no per-user event collection).
    //
    // Scale: three user_id-keyed shuffles over progressively smaller sets;
    // the final rollup is 3 rows. ----
    QueryDef(
      "q104_funnel",
      (s, dir) => {
        val e = eventsUs(s, dir)
        def stage(df: DataFrame, typ: String, prev: Option[DataFrame],
                  outCol: String): DataFrame = {
          val base = e.filter(col("event_type") === typ)
          val gated = prev match {
            case Some(p) => base.join(p, "user_id")
              .filter(col("us") > col(p.columns.last))
            case None => base
          }
          gated.groupBy("user_id").agg(min(col("us")).as(outCol))
        }
        val s1 = stage(e, "signup", None, "t1")
        val s2 = stage(e, "click", Some(s1), "t2")
        val s3 = stage(e, "purchase", Some(s2), "t3")
        def row(n: Int, step: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("users"))
            .select(lit(n.toLong).as("stage"), lit(step).as("step"), col("users"))
        row(1, "signup", s1)
          .unionByName(row(2, "click_after_signup", s2))
          .unionByName(row(3, "purchase_after_click", s3))
          .orderBy("stage")
      },
      Some(s"""
        WITH e AS ($oracleEventsUs),
        s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY e.user_id)
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS step,
                 COUNT(*) AS users FROM s1
          UNION ALL
          SELECT CAST(2 AS BIGINT), 'click_after_signup', COUNT(*) FROM s2
          UNION ALL
          SELECT CAST(3 AS BIGINT), 'purchase_after_click', COUNT(*) FROM s3
        )
        ORDER BY stage
      """.stripMargin.trim)),

    // ---- Event-sequence trigram mining: the most common 3-step behavior
    // paths across all users. Per user, events order by (us, event_id) —
    // the id tiebreak makes same-microsecond sequences deterministic — and
    // each event pairs with its next two via LEAD over the user-partitioned
    // window (bounded per user, never a global sort); the trigram counts
    // then roll up in one keyed aggregation. Top 20 by frequency. ----
    QueryDef(
      "q119_event_trigrams",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        eventsUs(s, dir)
          .select(col("user_id"), col("us"), col("event_id"),
            col("event_type"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .filter(col("e2").isNotNull && col("e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
            .as("trigram"))
          .groupBy("trigram")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("trigram"))
          .limit(20)
      },
      Some(s"""
        WITH seq AS (
          SELECT event_type,
                 LEAD(event_type, 1) OVER w AS e2,
                 LEAD(event_type, 2) OVER w AS e3
          FROM ($oracleEventsUs)
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        )
        SELECT concat(event_type, '>', e2, '>', e3) AS trigram,
               COUNT(*) AS n
        FROM seq
        WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY trigram
        ORDER BY n DESC, trigram
        LIMIT 20
      """.stripMargin.trim))
  )
}
