package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object TestSpark {

  /** Materialize EVERY output column of `df` (noop v2 sink — evaluates
    * each row in full, discards it, stays distributed).
    *
    * The robustness-axis execution pins originally forced queries with
    * `.count() >= 0`, which lets Catalyst PRUNE the projection: a
    * column whose expression throws on the fixture's pathological
    * values passes the pin and then aborts the driver-faithful Verify,
    * which materializes everything. That blind spot was real, not
    * hypothetical — round 16's skew parity matrix caught q30's
    * `pow(2, l_linenumber)` CAST_OVERFLOW on the mega-order's 10³+
    * linenumbers AFTER SkewInputSpec's count() pin had passed it. Every
    * axis loop forces through this helper now, so an execution pin
    * certifies the same evaluation surface Verify runs. */
  def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // Pin ANSI explicitly (r17 ADVICE): the non-finite guard contract
      // (guardedCast's "NULL iff non-finite", the loud CAST_OVERFLOW at
      // cents ingresses) depends on ANSI semantics — every abort-kind
      // pin in the axis specs would silently test the wrong contract
      // under a spark-defaults override. sys.props first so a deliberate
      // -D mode injection (the dev/parity.sh ansioff idiom) still lands.
      .config("spark.sql.ansi.enabled",
        sys.props.getOrElse("spark.sql.ansi.enabled", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
