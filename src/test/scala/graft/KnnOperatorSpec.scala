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

  test("the physical plan contains the custom operator, not a cross join") {
    val plan = Registry.queries("q71_knn_operator")(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("KnnJoin"), plan) // nodeName renders without "Exec"
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"))
  }
}
