package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 A7/G1/J9 batch twins: the lambda serving layer. The reference
  * upserts speed-layer results into Kudu and unions them with batch views;
  * with no Kudu/Delta jar on this box the same semantics are expressed as
  * (1) keyed merge = union + row_number()=1 per key by recency, and
  * (2) batch-view ∪ speed-view = full recompute (the lambda consistency
  * property, tested exactly here). Streaming twins live in graft.streaming
  * and are unit-tested (non-oracle). */
object ServingQueries {

  // Shared in Tables so a fixture dtype change is a one-file edit (round 6).
  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(s, dir)

  private val oracleEventsUs =
    """SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |       CAST(ROUND(value*100) AS BIGINT) AS cents FROM events""".stripMargin

  /** Epoch-µs for 2024-01-15 and 2024-01-20 00:00 UTC (events span Jan 2024). */
  private val cutUs = 1705276800000000L
  private val speedCutUs = 1705708800000000L

  lazy val defs: Seq[QueryDef] = Seq(
    // ---- A7: keyed upsert/merge — base snapshot + delta → latest per key ----
    QueryDef(
      "q47_upsert_merge",
      (s, dir) => {
        val e = eventsUs(s, dir)
        val base = e.filter(col("us") < cutUs)
        val delta = e.filter(col("us") >= cutUs)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)
        base.unionByName(delta)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("us"), col("cents"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH e AS ($oracleEventsUs),
        merged AS (
          SELECT * FROM e WHERE us < $cutUs
          UNION ALL
          SELECT * FROM e WHERE us >= $cutUs
        )
        SELECT user_id, event_id, event_type, us, cents
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY us DESC, event_id DESC) AS rn
          FROM merged
        ) WHERE rn = 1
        ORDER BY user_id
      """.stripMargin.trim)),

    // ---- G1/J9: lambda batch+speed view union == full recompute ----
    QueryDef(
      "q48_lambda_view_union",
      (s, dir) => {
        val e = eventsUs(s, dir).withColumn("day", date_trunc("day", col("ts")).cast("date"))
        // Per-day cents is corpus-linear and sign-mixed on BOTH levels of
        // the lambda merge: DECIMAL(38,0) accumulators end-to-end (the
        // inner views stay decimal so the outer re-sum never narrows),
        // BIGINT only at the final output cast — matching the oracle's
        // int128 SUMs + single final cast (r17 cast-width audit, q25
        // widen). n is a row count: bounded by corpus cardinality, BIGINT
        // by the repo-wide count contract.
        def view(df: DataFrame): DataFrame =
          df.groupBy("day").agg(count(lit(1)).as("n"),
            sum(col("cents").cast("decimal(38,0)")).as("cents"))
        view(e.filter(col("us") < speedCutUs))     // batch view (history)
          .unionByName(view(e.filter(col("us") >= speedCutUs))) // speed view (recent)
          .groupBy("day")
          .agg(sum(col("n")).as("n"),
            sum(col("cents")).cast("long").as("cents"))
          .orderBy("day")
      },
      Some(s"""
        WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, epoch_us(ts) AS us,
                          CAST(ROUND(value*100) AS BIGINT) AS cents FROM events),
        batch AS (SELECT day, COUNT(*) AS n, SUM(cents) AS cents
                  FROM e WHERE us < $speedCutUs GROUP BY day),
        speed AS (SELECT day, COUNT(*) AS n, SUM(cents) AS cents
                  FROM e WHERE us >= $speedCutUs GROUP BY day)
        SELECT day, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        FROM (SELECT * FROM batch UNION ALL SELECT * FROM speed)
        GROUP BY day
        ORDER BY day
      """.stripMargin.trim)),

    // ---- CDC apply: materialize a snapshot from an insert/update/delete
    // change log — the serving-layer twin of a Debezium/Delta CDF feed. The
    // fixture log derives deterministically from orders: every order
    // INSERTs at seq 1; keys ≡ 0 (mod 7) UPDATE the price at seq 2; keys
    // ≡ 0 (mod 13) DELETE at seq 3. Apply = arg_max by seq per key, then
    // drop keys whose LATEST op is the tombstone — one shuffle on the key,
    // no window sort (max_by is an ordinary aggregate). A late-arriving
    // lower-seq change can never override — exactly the Kudu/Delta
    // last-writer-wins contract q47 expresses for event upserts. ----
    QueryDef(
      "q121_cdc_apply",
      (s, dir) => {
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val ins = o.select(col("k"), lit(1L).as("seq"), lit("I").as("op"),
          col("cents"))
        val upd = o.filter(col("k") % 7 === 0)
          .select(col("k"), lit(2L).as("seq"), lit("U").as("op"),
            (col("cents") + 10000L).as("cents"))
        val del = o.filter(col("k") % 13 === 0)
          .select(col("k"), lit(3L).as("seq"), lit("D").as("op"),
            lit(null).cast("long").as("cents"))
        ins.unionByName(upd).unionByName(del)
          .groupBy("k")
          .agg(count(lit(1)).as("n_changes"),
            max_by(col("op"), col("seq")).as("last_op"),
            max_by(col("cents"), col("seq")).as("cents"))
          .filter(col("last_op") =!= "D")
          .select(col("k"), col("n_changes"), col("last_op"), col("cents"))
          .orderBy("k")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey AS k,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        log AS (
          SELECT k, CAST(1 AS BIGINT) AS seq, 'I' AS op, cents FROM o
          UNION ALL
          SELECT k, 2, 'U', cents + 10000 FROM o WHERE k % 7 = 0
          UNION ALL
          SELECT k, 3, 'D', CAST(NULL AS BIGINT) FROM o WHERE k % 13 = 0
        ),
        applied AS (
          SELECT k, COUNT(*) AS n_changes,
                 arg_max(op, seq) AS last_op,
                 arg_max(cents, seq) AS cents
          FROM log GROUP BY k
        )
        SELECT k, n_changes, last_op, cents
        FROM applied WHERE last_op <> 'D'
        ORDER BY k
      """.stripMargin.trim))
  )
}
