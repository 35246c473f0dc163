package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data selection operators: seeded sampling must be reproducible
  * (a re-run of the pipeline selects the same corpus) and close to the
  * requested fractions. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("seeded stratified sample is reproducible and near its fractions") {
    val e = Tables.events(spark, TestSpark.sf0001)
    val fr = Map("click" -> 0.2, "view" -> 0.2, "purchase" -> 1.0,
      "error" -> 0.0, "signup" -> 0.5)
    val s1 = e.stat.sampleBy("event_type", fr, 7L)
    val s2 = e.stat.sampleBy("event_type", fr, 7L)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty,
      "same seed must select the same rows")
    val counts = s1.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = e.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("error"), "fraction 0 excludes the class")
    assert(counts("purchase") == totals("purchase"), "fraction 1 keeps all")
    val clickRate = counts("click").toDouble / totals("click")
    assert(clickRate > 0.08 && clickRate < 0.35, s"click rate $clickRate")
  }

  test("seeded randomSplit partitions the corpus without loss or overlap") {
    val docs = Tables.read(spark, TestSpark.sf0001, "documents")
    val Array(train, test) = docs.randomSplit(Array(0.8, 0.2), 11L)
    assert(train.count() + test.count() == docs.count())
    assert(train.select("doc_id").intersect(test.select("doc_id")).isEmpty)
    val Array(train2, _) = docs.randomSplit(Array(0.8, 0.2), 11L)
    assert(train.exceptAll(train2).isEmpty, "same seed, same split")
  }
}
