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

  test("q122: prefix filtering prunes candidates and never plans a cartesian") {
    val df = Registry.queries("q122_prefix_jaccard_join")(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    // The whole point vs q33's bounded crossJoin: candidates come from an
    // EQUI-join on prefix tokens, so no cartesian/nested-loop appears.
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be an equi-join:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"canonical pair order: $r")
      assert(r.getDouble(5) > 0.8 && r.getDouble(5) <= 1.0,
        s"jaccard in (0.8, 1]: $r")
      val (na, nb, inter) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(inter <= math.min(na, nb), s"intersection bound: $r")
    }
    // Pruning is real: the prefix equi-join must generate strictly fewer
    // candidate pairs than the quadratic set x set space it replaces.
    val sets = Tables.read(spark, TestSpark.sf0001, "documents")
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(expr(
        """sort_array(array_distinct(transform(sequence(1, size(toks) - 2),
           i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
                          element_at(toks, i + 2)))))""").as("shs"))
      .distinct().count()
    val allPairs = sets * (sets - 1) / 2
    assert(rows.length < allPairs,
      s"expected fewer matches than the $allPairs-pair quadratic space")
  }

  test("q123: skew audit reports consistent per-column mass and ordered hitters") {
    val rows = Registry.queries("q123_skew_audit")(spark, TestSpark.sf0001)
      .collect()
    val nLine = Tables.read(spark, TestSpark.sf0001, "lineitem").count()
    val byCol = rows.groupBy(_.getString(0))
    assert(byCol.keySet == Set("l_orderkey", "l_partkey", "l_suppkey"))
    byCol.foreach { case (c, rs) =>
      assert(rs.length == 5, s"$c: top-5 hitters")
      assert(rs.forall(_.getLong(5) == nLine), s"$c: total mass = fact rows")
      assert(rs.forall(_.getDouble(6) >= 1.0), s"$c: skew factor >= 1")
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) > b.getLong(3) ||
            (a.getLong(3) == b.getLong(3) && a.getLong(2) < b.getLong(2)),
            s"$c: hitters ordered by (rows desc, key)")
        case _ =>
      }
      // rank-1 hitter carries exactly max_rows: skew * total / n_keys.
      val r1 = sorted.head
      assert(math.abs(r1.getDouble(6) * r1.getLong(5) / r1.getLong(4) -
        r1.getLong(3)) < 1.0, s"$c: skew identity vs top hitter")
    }
  }

  test("q121: CDC apply keeps exactly the non-tombstoned keys with last-writer state") {
    val rows = Registry.queries("q121_cdc_apply")(spark, TestSpark.sf0001)
      .collect()
    val orders = Tables.read(spark, TestSpark.sf0001, "orders")
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .as[(Long, Long)].collect().toMap
    val expectedKeys = orders.keySet.filter(_ % 13 != 0)
    assert(rows.map(_.getLong(0)).toSet == expectedKeys,
      "survivors are exactly the non-deleted keys")
    rows.foreach { r =>
      val (k, nChanges, lastOp, cents) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
      if (k % 7 == 0) {
        assert(lastOp == "U" && cents == orders(k) + 10000L,
          s"updated key must serve the updated price: $r")
        assert(nChanges == 2L, s"insert+update: $r")
      } else {
        assert(lastOp == "I" && cents == orders(k),
          s"untouched key serves the inserted price: $r")
        assert(nChanges == 1L, s"insert only: $r")
      }
    }
  }
}
