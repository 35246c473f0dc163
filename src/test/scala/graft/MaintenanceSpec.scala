package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Batch-layer maintenance a 100 TB lake needs daily: small-file compaction
  * and additive schema evolution. */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("small-file compaction preserves rows while collapsing files") {
    val base = Files.createTempDirectory("graft-compact").toString
    val frag = s"$base/fragmented"
    val events = Tables.events(spark, TestSpark.sf0001)
    events.repartition(64).write.parquet(frag) // simulate streaming small files
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag) == 64)
    val compact = s"$base/compacted"
    spark.read.parquet(frag).repartition(2).write.parquet(compact)
    assert(parquetFiles(compact) == 2)
    assert(spark.read.parquet(compact).count() == events.count())
  }

  test("additive schema evolution reads via mergeSchema") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    val v1 = Tables.read(spark, TestSpark.sf0001, "region")
    v1.write.parquet(dir)
    val v2 = v1.withColumn("r_tier", lit("standard"))
    v2.write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("r_tier"))
    assert(merged.count() == v1.count() * 2)
    // old rows surface the new column as null
    assert(merged.filter(col("r_tier").isNull).count() == v1.count())
  }
}
