package graft

import org.scalatest.funsuite.AnyFunSuite

/** The custom KnnJoin physical operator must agree exactly with the
  * DataFrame (crossJoin + window) formulation. */
class KnnOperatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("KnnJoinExec equals the DataFrame kNN bit-for-bit") {
    val viaOperator = Registry.queries("q71_knn_operator")(spark, TestSpark.sf0001)
      .select("q_id", "nb_id", "cos_sim")
    val viaDataFrame = Registry.queries("q44_knn_topk")(spark, TestSpark.sf0001)
      .select("q_id", "nb_id", "cos_sim")
    assert(viaOperator.count() == 100)
    assert(viaOperator.exceptAll(viaDataFrame).isEmpty &&
      viaDataFrame.exceptAll(viaOperator).isEmpty)
  }

  test("KnnFilterPushdown pushes q_id predicates into the query-side scan") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    graft.plans.VectorFunctions.register(spark2)
    val v = graft.sources.Tables.read(spark2, TestSpark.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", expr("sqrt(graft_dot(e, e))"))
    // Filter applied ABOVE the operator over the FULL query set:
    val filtered = graft.plans.Knn.topK(spark2, v, v, 5)
      .filter(col("q_id") < 10)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    assert(!optimized.startsWith("Filter"),
      s"q_id filter should be pushed below KnnJoin:\n$optimized")
    assert(optimized.contains("KnnJoin"), optimized)
    // Pushed into the parquet scan of the queries subtree:
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("LessThan(vec_id,10)"),
      s"expected scan-level pushdown:\n$physical")
    // And semantics are unchanged vs filtering the query set up front:
    val upfront = graft.plans.Knn.topK(spark2,
      v.filter(col("vec_id") < 10), v, 5)
    assert(filtered.exceptAll(upfront).isEmpty && upfront.exceptAll(filtered).isEmpty)
  }

  test("the physical plan contains the custom operator, not a cross join") {
    val plan = Registry.queries("q71_knn_operator")(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("KnnJoin"), plan) // nodeName renders without "Exec"
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"))
  }
}
