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

  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("cents", round(col("value") * 100).cast("long"))

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
        def view(df: DataFrame): DataFrame =
          df.groupBy("day").agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        view(e.filter(col("us") < speedCutUs))     // batch view (history)
          .unionByName(view(e.filter(col("us") >= speedCutUs))) // speed view (recent)
          .groupBy("day")
          .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
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
      """.stripMargin.trim))
  )
}
