package graft

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing (SURVEY §7.5 co-located joins): pre-partitioning both sides of
  * a recurring join key into the same bucket layout makes the join
  * shuffle-free — at 100 TB this converts the nightly fact-fact join from
  * a full network shuffle into local stitching. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("joining two bucketed tables needs no shuffle exchange") {
    val l = Tables.read(spark, TestSpark.sf0001, "lineitem")
    val o = Tables.read(spark, TestSpark.sf0001, "orders")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        spark.table("b_lineitem")("l_orderkey") === spark.table("b_orders")("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() ==
      l.join(o, l("l_orderkey") === o("o_orderkey")).count())
  }
}
