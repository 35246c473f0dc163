package graft

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Session-scoped memoization contracts: table reads share one DataFrame
  * per (session, dir, table) — the per-query fixed-cost fix — and
  * lazyLocalCheckpoint pins its source plan against the accumulator race
  * (SessionCache.pin scaladoc). */
class SessionCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Tables.read memoizes the DataFrame per (session, dir, table)") {
    val a = Tables.read(spark, TestSpark.sf0001, "nation")
    val b = Tables.read(spark, TestSpark.sf0001, "nation")
    // Same object ⇒ the parquet file index and schema footer read are
    // shared across all queries of the session, not repeated per call.
    assert(a eq b)
    // Distinct tables / dirs get distinct entries.
    assert(!(Tables.read(spark, TestSpark.sf0001, "region") eq a))
  }

  test("lazyLocalCheckpoint pins the source plan and stays correct") {
    import spark.implicits._
    val before = SessionCache.pinCount
    val src = Seq(1L, 2L, 3L).toDF("x").groupBy().sum("x")
    val ck = SessionCache.lazyLocalCheckpoint("spec-pin-a")(src)
    // >= rather than ==: pin() sweeps stopped-context entries from the
    // shared global map, so an exact delta would couple this test to
    // whatever other suites did with their sessions.
    assert(SessionCache.pinCount >= before + 1)
    // Lazy: schema is inspectable pre-action; the action then sees the
    // checkpointed result with unchanged semantics.
    assert(ck.columns.sameElements(Array("sum(x)")))
    assert(ck.collect().map(_.getLong(0)).toSeq == Seq(6L))
  }

  test("pin replaces per site tag instead of accumulating per call") {
    import spark.implicits._
    val src = Seq(1L).toDF("x")
    SessionCache.lazyLocalCheckpoint("spec-pin-b")(src)
    val after1 = SessionCache.pinCount
    // Re-pinning the SAME site in the same session must not grow the pin
    // set — a long-lived session holds at most one pinned plan per site.
    SessionCache.lazyLocalCheckpoint("spec-pin-b")(Seq(2L).toDF("x"))
    assert(SessionCache.pinCount == after1)
  }
}
