package graft

import org.apache.spark.sql.functions._

/** Ad-hoc comparison of q130 basket-pair formulations at sf0.1 — run with
  * `sbt "Test/runMain graft.ProfileQ130"`. Not part of the test suite.
  *
  * Variants:
  *   A (declared): distinct → self-join on l_orderkey → pair groupBy.
  *     EXPLAINS shows the self-join BROADCASTS one side with no
  *     ReusedExchange, so the scan+distinct runs twice.
  *   B: distinct → per-order collect_list → in-array pair expansion
  *     (orders are ≤7 lines, so the per-row expansion is bounded) →
  *     pair groupBy. One pass over lineitem, no self-join.
  */
object ProfileQ130 {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q130] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = graft.sources.Tables.read(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    li.count() // warm the scan

    def variantA() = {
      val a0 = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
      val b0 = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
      a0.join(b0, Seq("l_orderkey"))
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
        .orderBy(col("support").desc, col("pa"), col("pb")).limit(20)
    }
    def variantB() = {
      li.groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"""))
          .as("pr"))
        .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .agg(count(lit(1)).as("support"))
        .orderBy(col("support").desc, col("pa"), col("pb")).limit(20)
    }
    // Warm both code paths once, then time alternating runs.
    variantA().collect(); variantB().collect()
    val ra = time("A self-join")(variantA().collect())
    val rb = time("B collect_list")(variantB().collect())
    time("A self-join (2)")(variantA().collect())
    time("B collect_list (2)")(variantB().collect())
    println(s"[q130] results equal: ${ra.toSeq == rb.toSeq}")
    // No spark.stop(): TestSpark.spark is the suite-shared session, and
    // stopping it here would kill any test running in the same JVM. sbt's
    // Test/runMain forks, so JVM exit cleans up the session regardless.
  }
}
