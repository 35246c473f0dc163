package graft

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SURVEY §2 A2-A4: CSV/JSON/parquet sinks+sources and the table catalog. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString + s"/$name"

  test("A3: CSV round-trip preserves the nation table") {
    val nation = Tables.read(spark, TestSpark.sf0001, "nation")
    val path = tmp("csv")
    nation.write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true").schema(nation.schema).csv(path)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("A3: JSON round-trip preserves the nation table") {
    val nation = Tables.read(spark, TestSpark.sf0001, "nation")
    val path = tmp("json")
    nation.write.json(path)
    val back = spark.read.schema(nation.schema).json(path)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("A3: ORC round-trip preserves the nation table") {
    val nation = Tables.read(spark, TestSpark.sf0001, "nation")
    val path = tmp("orc")
    nation.write.orc(path)
    val back = spark.read.schema(nation.schema).orc(path)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("A2: parquet sink round-trip") {
    val region = Tables.read(spark, TestSpark.sf0001, "region")
    val path = tmp("parquet")
    region.write.parquet(path)
    assert(spark.read.parquet(path).exceptAll(region).isEmpty)
  }

  test("A4: catalog table sink/source (saveAsTable / spark.table)") {
    val supplier = Tables.read(spark, TestSpark.sf0001, "supplier")
    supplier.write.mode("overwrite").saveAsTable("graft_supplier")
    val back = spark.table("graft_supplier")
    assert(back.count() == supplier.count())
    assert(back.exceptAll(supplier).isEmpty)
  }
}
