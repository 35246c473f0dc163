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

  test("zero-norm (NaN-cosine) corpus vectors rank last, never crowding out real neighbors") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.plans.VectorFunctions.register(spark)
    // One query, three unit-ish neighbors, one ZERO vector (cos = 0/0 = NaN).
    // There is no window-formulation semantics to mirror here: under ANSI
    // mode (Spark 4 default) the q44-style division THROWS DIVIDE_BY_ZERO —
    // asserted below. The operator's documented contract is that degenerate
    // vectors rank last.
    val rows = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.5f, 0.5f)),
      (4L, Array(0.0f, 0.0f)), // zero norm
      (5L, Array(0.1f, 0.9f))).toDF("vec_id", "e")
      .withColumn("nrm", expr("sqrt(graft_dot(e, e))"))
    val q = rows.filter($"vec_id" === 1L)
    val top3 = graft.plans.Knn.topK(spark, q, rows, 3)
      .select("rank", "nb_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(top3.map(_._2) == Seq(2L, 3L, 5L),
      s"finite-cosine neighbors in similarity order, NaN excluded: $top3")
    val top4 = graft.plans.Knn.topK(spark, q, rows, 4)
      .select("rank", "nb_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(top4.last._2 == 4L, s"the NaN-cosine neighbor ranks last: $top4")
    // And the naive window formulation cannot express this at all:
    val windowFails = intercept[Exception] {
      q.select($"vec_id".as("q_id"), $"e".as("ae"), $"nrm".as("anrm"))
        .crossJoin(rows.select($"vec_id".as("nb_id"), $"e".as("be"), $"nrm".as("bnrm")))
        .filter($"q_id" =!= $"nb_id")
        .withColumn("cos", expr("graft_dot(ae, be) / (anrm * bnrm)"))
        .collect()
    }
    assert(windowFails.getMessage.contains("DIVIDE_BY_ZERO"))
  }
}
