package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 categories E (window functions), D4/D6/D7/D8 (percentiles,
  * ordered collect, arg_min/max, stats), C7/C8 (range + as-of joins).
  *
  * Determinism: every window ORDER BY ends in a unique key (event_id /
  * o_orderkey / c_custkey), so ranks and frames are total-order stable.
  * Doubles appear only as deterministic functions of exact integers/decimals
  * (same IEEE expression both engines), then cast to DECIMAL (SURVEY §7.4).
  */
object WindowQueries {
  import Q._

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** events with epoch-µs `us` and exact integer cents (value has 2dp).
    * Shared in Tables so a fixture dtype change is a one-file edit. */
  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(s, dir)

  private val oracleEventsUs =
    """SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |       CAST(ROUND(value*100) AS BIGINT) AS cents FROM events""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    // ---- E1: ranking trio, top-N per group ----
    QueryDef(
      "q13_top_orders_per_customer",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            // finite(): a NaN/Inf price ranks FIRST in both engines (NaN
            // greatest) and so always reaches the oracle's loud CAST —
            // mirror it instead of outD's silent NULL (sixth axis).
            outD(Q.finite(col("o_totalprice")), 2).as("price"),
            col("rn"), col("rnk"), col("drnk"))
          .orderBy("o_custkey", "rn")
      },
      Some("""
        SELECT o_custkey, o_orderkey, price, rn, rnk, drnk FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
                 ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
                 DENSE_RANK() OVER w AS drnk
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ) WHERE rn <= 3
        ORDER BY o_custkey, rn
      """.stripMargin.trim)),

    // ---- E2: lag/lead over per-customer order history ----
    QueryDef(
      "q14_order_gaps",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("d", col("o_orderdate").cast("date"))
          .withColumn("prev_d", lag(col("d"), 1).over(w))
          .withColumn("next_d", lead(col("d"), 1).over(w))
          .filter(col("prev_d").isNotNull)
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(col("d"), col("prev_d")).cast("long").as("gap_days"),
            coalesce(datediff(col("next_d"), col("d")), lit(-1)).cast("long")
              .as("fwd_days"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day', prev_d, d) AS BIGINT) AS gap_days,
               CAST(COALESCE(date_diff('day', d, next_d), -1) AS BIGINT) AS fwd_days
        FROM (
          SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
                 LAG(CAST(o_orderdate AS DATE)) OVER w AS prev_d,
                 LEAD(CAST(o_orderdate AS DATE)) OVER w AS next_d
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ) WHERE prev_d IS NOT NULL
        ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)),

    // ---- E3: running totals (ROWS frame) over the event stream ----
    QueryDef(
      "q15_running_totals",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        eventsUs(s, dir)
          .withColumn("run_n", count(lit(1)).over(w))
          // Corpus-linear and sign-mixed, but EVERY prefix is itself an
          // output row here, so a >2^63 prefix is a genuine BIGINT
          // output-contract violation at that row — the BIGINT window sum
          // aborts at exactly the point the contract demands, matching
          // where the oracle's final cast would. Output-contract bound,
          // no internal widen needed — unlike q16's trailing-hour frame,
          // whose prefixes are internal (r17 cast-width audit).
          .withColumn("run_cents", sum(col("cents")).over(w))
          .select("user_id", "event_id", "run_n", "run_cents")
          .orderBy("user_id", "event_id")
      },
      Some(s"""
        SELECT user_id, event_id, COUNT(*) OVER w AS run_n,
               CAST(SUM(cents) OVER w AS BIGINT) AS run_cents
        FROM ($oracleEventsUs)
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
      """.stripMargin.trim)),

    // ---- E3: RANGE frame — events within the trailing hour per user ----
    QueryDef(
      "q16_trailing_hour",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
          .rangeBetween(-3600L, 0L)
        eventsUs(s, dir)
          .withColumn("es", expr("us div 1000000"))
          .withColumn("hour_n", count(lit(1)).over(w))
          // Same widen as q15: a trailing hour legally holds any corpus
          // fraction (burst traffic) — decimal accumulator, BIGINT output.
          .withColumn("hour_cents",
            sum(col("cents").cast("decimal(38,0)")).over(w).cast("long"))
          .select("user_id", "event_id", "hour_n", "hour_cents")
          .orderBy("user_id", "event_id")
      },
      Some(s"""
        SELECT user_id, event_id, COUNT(*) OVER w AS hour_n,
               CAST(SUM(cents) OVER w AS BIGINT) AS hour_cents
        FROM (SELECT *, us // 1000000 AS es FROM ($oracleEventsUs))
        WINDOW w AS (PARTITION BY user_id ORDER BY es
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
      """.stripMargin.trim)),

    // ---- D7: arg_min/arg_max (deterministic first/last) ----
    QueryDef(
      "q17_user_first_last",
      (s, dir) =>
        eventsUs(s, dir)
          .groupBy("user_id")
          .agg(
            min_by(col("event_type"), col("event_id")).as("first_type"),
            max_by(col("event_type"), col("event_id")).as("last_type"),
            min(col("event_id")).as("first_event"),
            max(col("event_id")).as("last_event"),
            count(lit(1)).as("n"))
          .orderBy("user_id"),
      Some("""
        SELECT user_id,
               arg_min(event_type, event_id) AS first_type,
               arg_max(event_type, event_id) AS last_type,
               MIN(event_id) AS first_event, MAX(event_id) AS last_event,
               COUNT(*) AS n
        FROM events GROUP BY user_id ORDER BY user_id
      """.stripMargin.trim)),

    // ---- E1: ntile / percent_rank / cume_dist ----
    QueryDef(
      "q18_acctbal_quartiles",
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("pr", outD(percent_rank().over(w), 9))
          .withColumn("cd", outD(cume_dist().over(w), 9))
          .select(col("c_custkey"), col("c_mktsegment"), col("quartile"),
            col("pr"), col("cd"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment,
               NTILE(4) OVER w AS quartile,
               CAST(CAST(PERCENT_RANK() OVER w AS DECIMAL(18,9)) AS DOUBLE) AS pr,
               CAST(CAST(CUME_DIST() OVER w AS DECIMAL(18,9)) AS DOUBLE) AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_custkey
      """.stripMargin.trim)),

    // ---- E5: top-k per group (QUALIFY on the oracle side) ----
    QueryDef(
      "q19_top_parts_per_brand",
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, dir, "part")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("p_brand"), col("p_partkey"),
            outD(Q.finite(col("p_retailprice")), 2).as("price"), col("rn"))
          .orderBy("p_brand", "rn")
      },
      Some("""
        SELECT p_brand, p_partkey, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
        QUALIFY rn <= 2
        ORDER BY p_brand, rn
      """.stripMargin.trim)),

    // ---- C8: as-of join via the scalable union + last(ignoreNulls) plan.
    // For each purchase, the most recent view by the same user at/before it
    // (same-µs ties resolved by event_id — identical frame both sides).
    // This is O(n log n) — no per-user quadratic join — so it survives scale.
    QueryDef(
      "q20_asof_purchase_attribution",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        eventsUs(s, dir)
          .filter(col("event_type").isin("purchase", "view"))
          .withColumn("view_id",
            when(col("event_type") === "view", col("event_id")))
          .withColumn("view_us",
            when(col("event_type") === "view", col("us")))
          .withColumn("last_view_id", last(col("view_id"), ignoreNulls = true).over(w))
          .withColumn("last_view_us", last(col("view_us"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("last_view_id"),
            (col("us") - col("last_view_us")).as("gap_us"))
          .orderBy("event_id")
      },
      Some(s"""
        SELECT event_id, user_id, last_view_id, us - last_view_us AS gap_us
        FROM (
          SELECT *,
                 LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
                   OVER w AS last_view_id,
                 LAST_VALUE(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
                   OVER w AS last_view_us
          FROM ($oracleEventsUs)
          WHERE event_type IN ('purchase', 'view')
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ) WHERE event_type = 'purchase'
        ORDER BY event_id
      """.stripMargin.trim)),

    // ---- D4: exact median / p90 via rank positions (no float interpolation,
    // so the result is integer-exact and engine-independent) ----
    QueryDef(
      "q21_value_percentiles",
      (s, dir) => {
        eventsUs(s, dir).createOrReplaceTempView("events_us")
        s.sql(percentileSql("events_us"))
      },
      Some(percentileSql(s"($oracleEventsUs)"))),

    // ---- D6: ordered distinct collect. The ARRAY is built by the agg but
    // projected as a joined string: the driver's pandas hasher cannot hash
    // ndarray cells (r01 ERR), so arrays never reach the final schema. ----
    QueryDef(
      "q22_user_event_type_sets",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
            count(lit(1)).as("n"))
          .orderBy("user_id"),
      Some("""
        SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
               COUNT(*) AS n
        FROM events GROUP BY user_id ORDER BY user_id
      """.stripMargin.trim)),

    // ---- D8: variance / stddev / correlation from exact decimal sums.
    // All floating math happens on doubles derived from exact sums with an
    // identical expression tree both sides → bit-identical results. ----
    QueryDef(
      "q23_acctbal_stats",
      (s, dir) => {
        // The shared SQL text CASTs every row's c_acctbal — loud in DuckDB,
        // silently NULL in Spark. Guarding the VIEW keeps the one-text-two-
        // engines property while restoring the oracle's abort (sixth axis);
        // identical on finite balances.
        t(s, dir, "customer")
          .withColumn("c_acctbal", Q.finite(col("c_acctbal")))
          .createOrReplaceTempView("customer")
        t(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql(statsSql)
      },
      Some(statsSql)),

    // ---- C7: range (interval) join — errors within 5 min after a purchase ----
    QueryDef(
      "q24_purchase_error_correlation",
      (s, dir) => {
        val e = eventsUs(s, dir)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("us").as("p_us"))
        val x = e.filter(col("event_type") === "error")
          .select(col("user_id").as("e_user"), col("us").as("e_us"))
        p.join(x, col("p_user") === col("e_user") &&
            col("e_us") >= col("p_us") && col("e_us") <= col("p_us") + 300000000L)
          .groupBy(col("p_user").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"), min(col("e_us") - col("p_us")).as("min_gap_us"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH e AS ($oracleEventsUs)
        SELECT p.user_id AS user_id, COUNT(*) AS n_pairs,
               MIN(x.us - p.us) AS min_gap_us
        FROM e p JOIN e x
          ON p.user_id = x.user_id
         AND p.event_type = 'purchase' AND x.event_type = 'error'
         AND x.us >= p.us AND x.us <= p.us + 300000000
        GROUP BY p.user_id
        ORDER BY user_id
      """.stripMargin.trim)),

    // ---- Winsorized robust statistics: clip each event's cents to its
    // event_type's [p05, p95] (nearest-rank on exact integer cents, q21's
    // idiom) before re-aggregating — the outlier-resistant metrics layer.
    // One SQL text runs in both engines (common dialect, like q21/q23).
    //
    // Scale: two window passes partitioned by event_type feed a tiny bounds
    // table that joins back broadcast-style; everything else is one
    // hash aggregation. All-integer arithmetic — no float determinism
    // surface at all. ----
    QueryDef(
      "q103_winsorized_stats",
      (s, dir) => {
        eventsUs(s, dir).createOrReplaceTempView("events_us")
        s.sql(winsorizeSql("events_us"))
      },
      Some(winsorizeSql(s"($oracleEventsUs)")))
      ,

    // ---- E5 at scale: top-k per group as an AGGREGATE (custom
    // TypedImperativeAggregate `graft_topk`, plans/TopKAgg.scala) instead
    // of the universal row_number() window. The window plan sorts every
    // group's every row; the aggregate keeps a k-bounded heap per group on
    // the map side, so the shuffle carries ≤ k rows per group per
    // partition and nothing sorts the full input — the shape a native
    // engine uses. Must equal q19's window formulation rank-for-rank
    // (same order: score DESC, id ASC, NaN last), so the oracle IS the
    // window SQL. ----
    QueryDef(
      "q105_topk_aggregate",
      (s, dir) => {
        graft.plans.VectorFunctions.register(s)
        // finite() at the INPUT, not the output: graft_topk's own contract
        // ranks NaN last (it would silently EXCLUDE a NaN price), while the
        // oracle's window ranks NaN first and always CASTs it loudly at
        // rn=1. A group with any non-finite price must abort here exactly
        // as it does there; the operator keeps its documented NaN-last
        // semantics for library callers (sixth axis).
        t(s, dir, "orders")
          .withColumn("o_totalprice", Q.finite(col("o_totalprice")))
          .groupBy(col("o_custkey"))
          .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
          .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "e")))
          .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rn"),
            col("e.id").as("o_orderkey"),
            outD(col("e.score"), 2).as("price"))
          .orderBy("o_custkey", "rn")
      },
      Some("""
        SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn
      """.stripMargin.trim))
  )

  /** Winsorize: nearest-rank p05/p95 bounds per event_type, clip, then
    * re-aggregate. Valid Spark SQL and DuckDB SQL alike — all-BIGINT. */
  private def winsorizeSql(src: String): String =
    s"""
      WITH r AS (
        SELECT event_type, event_id, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM $src
      ),
      b AS (
        SELECT event_type,
               MAX(CASE WHEN rn = CAST(CEIL(n * 0.05) AS BIGINT) THEN cents END) AS lo,
               MAX(CASE WHEN rn = CAST(CEIL(n * 0.95) AS BIGINT) THEN cents END) AS hi
        FROM r GROUP BY event_type
      )
      SELECT r.event_type, MAX(b.lo) AS lo_cents, MAX(b.hi) AS hi_cents,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN r.cents < b.lo THEN b.lo
                           WHEN r.cents > b.hi THEN b.hi
                           ELSE r.cents END) AS BIGINT) AS winsorized_cents,
             CAST(SUM(CASE WHEN r.cents < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
             CAST(SUM(CASE WHEN r.cents > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi
      FROM r JOIN b ON r.event_type = b.event_type
      GROUP BY r.event_type
      ORDER BY r.event_type
    """.stripMargin.trim

  /** Median (lo/hi rank positions) + nearest-rank p90 per event_type;
    * valid Spark SQL and DuckDB SQL alike. */
  private def percentileSql(src: String): String =
    s"""
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(FLOOR((n+1)/2.0) AS BIGINT) THEN cents END) AS median_lo_cents,
             MAX(CASE WHEN rn = CAST(FLOOR((n+2)/2.0) AS BIGINT) THEN cents END) AS median_hi_cents,
             MAX(CASE WHEN rn = CAST(CEIL(n*0.9) AS BIGINT) THEN cents END) AS p90_cents,
             MAX(n) AS n
      FROM (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM $src
      )
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim

  /** Identical text runs in Spark SQL and DuckDB (common function surface). */
  private val statsSql: String =
    """
      WITH c AS (
        SELECT n_name, CAST(c_acctbal AS DECIMAL(18,2)) AS x,
               CAST(c_custkey AS DECIMAL(18,2)) AS y
        FROM customer JOIN nation ON c_nationkey = n_nationkey
      ), agg AS (
        SELECT n_name, COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(x*x) AS DOUBLE) AS sxx,
               CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(y*y) AS DOUBLE) AS syy,
               CAST(SUM(x*y) AS DOUBLE) AS sxy,
               CAST(CAST(SUM(x) AS DECIMAL(38,2)) AS DOUBLE) AS sum_bal
        FROM c GROUP BY n_name
      )
      SELECT n_name, n, sum_bal,
             -- DECIMAL(38,4), not (18,4): the rounding gate must hold the
             -- DOMAIN bound, not the fixture's. |x| <= 1e16 (DECIMAL(18,2)
             -- class) puts variance at up to ~1e32 and std at ~1e16 — the
             -- (18,4) gate aborted (NUMERIC_VALUE_OUT_OF_RANGE) on the
             -- boundary fixture's legal +-9.9e9 balances the moment the
             -- r16 materialized pins stopped count() from pruning it.
             -- Same scale 4/6, so organic outputs are byte-identical.
             -- NULLIF guards the three zero-able divisors (singleton
             -- group -> n-1 = 0; zero-variance group -> corr denominator
             -- 0): ANSI double division THROWS on zero, and NULL is the
             -- honest undefined-statistic value on both engines.
             CAST(CAST((sxx - sx*sx/n) / NULLIF(n-1, 0) AS DECIMAL(38,4)) AS DOUBLE) AS var_bal,
             CAST(CAST(SQRT((sxx - sx*sx/n) / NULLIF(n-1, 0)) AS DECIMAL(38,4)) AS DOUBLE) AS std_bal,
             CAST(CAST((n*sxy - sx*sy) / NULLIF(SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy), 0)
                  AS DECIMAL(18,6)) AS DOUBLE) AS corr_bal_key
      FROM agg
      ORDER BY n_name
    """.stripMargin.trim
}
