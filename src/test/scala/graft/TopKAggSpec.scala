package graft

import graft.plans.{TopKBuffer, TopKBy}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k-per-group aggregate (plans/TopKAgg.scala): rank
  * contract, buffer mechanics, serde, and the planning claim that justifies
  * its existence — ObjectHashAggregate with a genuine partial stage, no
  * full-input sort. */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("buffer keeps the k best and evicts in O(log k) order") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 11L), (3.0, 12L), (4.0, 13L), (2.0, 14L))
      .foreach { case (s, i) => b.offer(s, i) }
    val kept = b.heap.toArray.sortWith((x, y) =>
      TopKBuffer.rankCompare(x._1, x._2, y._1, y._2) < 0)
    assert(kept.toSeq == Seq((5.0, 11L), (4.0, 13L), (3.0, 12L)))
  }

  test("ties break by smaller id; NaN ranks last") {
    val b = new TopKBuffer(2)
    b.offer(1.0, 7L); b.offer(1.0, 3L); b.offer(Double.NaN, 1L)
    val kept = b.heap.toArray.sortWith((x, y) =>
      TopKBuffer.rankCompare(x._1, x._2, y._1, y._2) < 0)
    assert(kept.map(_._2).toSeq == Seq(3L, 7L))
    // NaN survives only when there is room left over.
    val c = new TopKBuffer(3)
    c.offer(Double.NaN, 1L); c.offer(1.0, 2L)
    val kept2 = c.heap.toArray.sortWith((x, y) =>
      TopKBuffer.rankCompare(x._1, x._2, y._1, y._2) < 0)
    assert(kept2.map(_._2).toSeq == Seq(2L, 1L))
  }

  test("serde round-trips the buffer through the shuffle format") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKBy(Literal(0.0), Literal(0L), 4)
    val b = new TopKBuffer(4)
    Seq((2.5, 1L), (7.5, 2L), (Double.NaN, 3L)).foreach { case (s, i) =>
      b.offer(s, i)
    }
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.k == 4)
    val norm = (x: TopKBuffer) => x.heap.toArray.sortBy(_._2).map {
      case (s, i) => (if (s.isNaN) "NaN" else s.toString, i)
    }.toSeq
    assert(norm(rt) == norm(b))
  }

  test("aggregate equals the row_number window formulation on events") {
    graft.plans.VectorFunctions.register(spark)
    val e = graft.sources.Tables.events(spark, TestSpark.sf0001)
    val viaAgg = e.groupBy("user_id")
      .agg(expr("graft_topk(value, event_id, 4)").as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "x")))
      .select(col("user_id"), (col("pos") + 1).cast("long").as("rn"),
        col("x.id").as("event_id"), col("x.score").as("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    val viaWindow = e
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 4)
      .select(col("user_id"), col("rn"), col("event_id"), col("value"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("k accepts any foldable integral and rejects the rest at plan time") {
    graft.plans.VectorFunctions.register(spark)
    val e = graft.sources.Tables.events(spark, TestSpark.sf0001)
    // Foldable arithmetic and a BIGINT literal both fold to Int k.
    val viaArith = e.groupBy("user_id")
      .agg(expr("graft_topk(value, event_id, 1 + 1)").as("top")).count()
    val viaBigint = e.groupBy("user_id")
      .agg(expr("graft_topk(value, event_id, CAST(2 AS BIGINT))").as("top")).count()
    assert(viaArith == viaBigint)
    // Non-foldable k (a column) and non-positive k are rejected when the
    // expression is built — k bounds per-heap state and must be known at
    // plan time.
    intercept[Exception] {
      e.groupBy("user_id")
        .agg(expr("graft_topk(value, event_id, user_id)").as("top")).count()
    }
    intercept[Exception] {
      e.groupBy("user_id")
        .agg(expr("graft_topk(value, event_id, 0)").as("top")).count()
    }
  }

  test("register() heals a half-populated function registry") {
    // The round-5 race fix: if graft_dot is present but graft_topk is not
    // (a concurrent/partial registration), register() must still add the
    // missing one rather than skipping both behind a graft_dot-only guard.
    val s2 = spark.newSession()
    val reg = s2.sessionState.functionRegistry
    val dot = new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")
    val topk = new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk")
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => graft.plans.DotProduct(exprs(0), exprs(1)), "built-in")
    assert(reg.functionExists(dot) && !reg.functionExists(topk))
    graft.plans.VectorFunctions.register(s2)
    assert(reg.functionExists(dot) && reg.functionExists(topk))
  }

  test("plans as ObjectHashAggregate with a partial stage and no sort") {
    graft.plans.VectorFunctions.register(spark)
    val plan = graft.sources.Tables.read(spark, TestSpark.sf0001, "orders")
      .groupBy("o_custkey")
      .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_topk"), plan)
    assert(!plan.contains("Window"), plan)
    // The aggregate subtree must not sort its input (the whole point vs
    // the window formulation); the only acceptable Sort would come from a
    // downstream orderBy, which this plan does not have.
    assert(!plan.contains("Sort "), plan)
  }
}
