package graft

import graft.functions.Components
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connected components: edge endpoints share a label; reps are members") {
    val verts = (0L to 9L).toDF("id")
    // {0,1,2} via chain, {3,4} pair, {5} .. {9} singletons
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("src", "dst")
    val comp = Components.connectedComponents(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(comp(0L) == 0L && comp(1L) == 0L && comp(2L) == 0L)
    assert(comp(3L) == 3L && comp(4L) == 3L)
    (5L to 9L).foreach(v => assert(comp(v) == v, s"singleton $v"))
  }

  test("cluster labels are a fixpoint (second pass changes nothing)") {
    val verts = (0L to 6L).toDF("id")
    val edges = Seq((6L, 0L), (5L, 6L), (2L, 4L)).toDF("src", "dst")
    val once = Components.connectedComponents(verts, edges)
    // Relabel using reps as vertices with the same edges mapped through reps:
    val m = once.as[(Long, Long)].collect().toMap
    val mappedEdges = edges.as[(Long, Long)].collect()
      .map { case (a, b) => (m(a), m(b)) }.toSeq.toDF("src", "dst")
    val twice = Components.connectedComponents(
      once.select(col("rep").as("id")).distinct(), mappedEdges)
      .as[(Long, Long)].collect().toMap
    twice.foreach { case (id, rep) => assert(id == rep, "reps must be stable") }
  }

  test("q133 dedup ROI accounting matches q78's cluster histogram") {
    val rows = Registry.queries("q133_dedup_roi")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    val nDocs = graft.sources.Tables
      .read(spark, TestSpark.sf0001, "documents").count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "doc conservation")
    rows.foreach { r =>
      val (size, nClusters, n, tokTotal, tokRemovable) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(n == size * nClusters, s"docs = size x clusters: $r")
      assert(tokRemovable <= tokTotal, s"removable tokens bounded: $r")
      // Size-1 clusters remove nothing.
      if (size == 1L) assert(r.getLong(3) == 0L && tokRemovable == 0L)
    }
    // The real cross-check: q133's per-size histogram must equal the one
    // derived from q78's declared output (same clustering, two queries).
    val fromQ78 = Registry
      .queries("q78_dedup_clusters")(spark, TestSpark.sf0001)
      .groupBy("cluster_size")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromQ133 = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fromQ133 == fromQ78,
      s"q133 histogram $fromQ133 diverges from q78's $fromQ78")
  }
}
