package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Containment/error contracts of the probabilistic join structures. */
class SketchJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Bloom pre-filter admits every true match (no false negatives)") {
    val orders = Tables.read(spark, TestSpark.sf0001, "orders")
    val customers = Tables.read(spark, TestSpark.sf0001, "customer")
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
    val bloom = urgent.stat.bloomFilter("o_custkey", 100000L, 0.03)
    val bbc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bbc.value.mightContain(k))
    val candidates = customers.filter(mightContain($"c_custkey"))
      .select("c_custkey")
    val exact = customers.join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .select("c_custkey")
    assert(exact.exceptAll(candidates).isEmpty,
      "every exact buyer must pass the bloom filter")
  }

  test("Count-Min Sketch never underestimates, stays within epsilon") {
    val e = Tables.events(spark, TestSpark.sf0001)
    val cms = e.stat.countMinSketch("event_type", 0.001, 0.99, 42)
    val total = e.count()
    val exact = e.groupBy("event_type").count()
      .as[(String, Long)].collect()
    exact.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      assert(est >= n, s"CMS underestimated $t: $est < $n")
      assert(est <= n + (0.001 * total).ceil.toLong + 1,
        s"CMS overestimate out of bound for $t: $est vs $n")
    }
  }
}
