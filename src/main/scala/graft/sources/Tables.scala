package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * All tables are plain parquet scans except `events`: its `ts` column is
  * physical parquet TIMESTAMP(NANOS), which Spark 4.1.2 rejects with
  * PARQUET_TYPE_ILLEGAL unless `spark.sql.legacy.parquet.nanosAsLong` is set.
  * With the flag, `ts` arrives as nanos-since-epoch LongType and is converted
  * here to a microsecond timestamp — numerically identical to DuckDB's own
  * ns→µs truncation of the same column, so oracle queries agree (FIXTURES.md).
  *
  * The harness builds the SparkSession without this conf, so it is set here,
  * per read; the conf is consulted at scan planning time, so setting it right
  * before `spark.read` is sufficient and does not disturb other scans.
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
        case "events" => events(spark, dir)
        case t        => spark.read.parquet(s"$dir/$t.parquet")
      }
    }

  /** The ONE ts conversion shared by the batch reader and the streaming
    * replay (StreamingOps.fileReplay): nanos-as-long → µs timestamp. The
    * lambda parity guarantee (replay ≡ batch) depends on both paths using
    * this exact expression — never inline a copy.
    *
    * No-op when `ts` is already a timestamp: re-written copies of the
    * fixture (e.g. ScaleCheck's 10× replica, user-materialized views) carry
    * a proper TIMESTAMP column, and only the driver's original
    * TIMESTAMP(NANOS) parquet arrives as LongType via the nanosAsLong
    * shim. */
  def nanosTsToMicros(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }

  /** Conf key the nanos shim needs (consulted at scan planning time). */
  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** `events` with `ts` as a µs-precision timestamp (see object doc). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set(NanosAsLongConf, "true")
    nanosTsToMicros(spark.read.parquet(s"$dir/events.parquet"))
  }

}
