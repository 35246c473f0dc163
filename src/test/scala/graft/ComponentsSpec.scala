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

  /** Plain union-find reference: rep = min vertex id of each component. */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(v => v.toLong -> find(v).toLong).toMap
  }

  /** Both execution paths, pinned against each other and the reference:
    * the default caps route these tiny graphs through the r19 driver
    * union-find; caps=0 forces the distributed min-label loop. */
  private def ccOf(n: Int, edges: Seq[(Long, Long)],
      forceLoop: Boolean = false): Map[Long, Long] = {
    val verts = (0L until n.toLong).toDF("id")
    val edf = if (edges.isEmpty)
      Seq.empty[(Long, Long)].toDF("src", "dst")
    else edges.toDF("src", "dst")
    val cap = if (forceLoop) 0L else 2000000L
    Components.connectedComponents(verts, edf,
      driverVertexCap = cap, driverEdgeCap = cap)
      .as[(Long, Long)].collect().toMap
  }

  // Randomized insurance on the round-10 fixpoint-exit rewrite: the loop now
  // exits on the edge-violation certificate (round ≥1) or changed==0 (round
  // 0), and round 0 skips the label join entirely — so every exit path and
  // the round-0 shortcut must still produce the exact union-find labeling.
  test("connected components equal a union-find reference on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(40)
      val m = rnd.nextInt(60)
      // Self-loops and duplicate/reversed edges on purpose — und unions both
      // directions and min-propagation must be idempotent under them.
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = ufComponents(n, edges)
      assert(ccOf(n, edges) == want,
        s"driver path, trial $trial (n=$n, m=$m, edges=$edges)")
      assert(ccOf(n, edges, forceLoop = true) == want,
        s"loop path, trial $trial (n=$n, m=$m, edges=$edges)")
    }
  }

  test("phantom-endpoint random graphs: driver and loop paths agree") {
    // r19 ADVICE #2: the two paths used to diverge on undeclared edge
    // endpoints (the driver union-find bridged through phantoms, the loop
    // only lets a phantom lower a neighbor's label at round 0). The driver
    // path now replicates the loop; random graphs with endpoints drawn
    // from [-n, 2n) — ids outside [0, n) are undeclared, including ones
    // SMALLER than every declared id (the label-lowering case) — must
    // agree exactly between the paths.
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 2 + rnd.nextInt(20)
      val m = 1 + rnd.nextInt(40)
      val edges = Seq.fill(m)(
        ((rnd.nextInt(3 * n) - n).toLong, (rnd.nextInt(3 * n) - n).toLong))
      val driver = ccOf(n, edges)
      val loop = ccOf(n, edges, forceLoop = true)
      assert(driver == loop, s"trial $trial n=$n edges=$edges")
    }
  }

  test("adversarial shapes: long path, cycle, star, edge-free round-0 exit") {
    for (forceLoop <- Seq(false, true)) {
      // Path 0-1-...-24: diameter 24 forces multiple certificate rounds and
      // real pointer-jump contraction (labels converge in O(log diameter)).
      val path = (0L until 24L).map(i => (i, i + 1))
      assert(ccOf(25, path, forceLoop) == (0L until 25L).map(_ -> 0L).toMap)
      // Cycle (closing edge makes min propagate both ways) + separate star.
      val cycle = (0L until 9L).map(i => (i, i + 1)) :+ (9L, 0L)
      val star = (11L to 15L).map(v => (10L, v))
      val got = ccOf(16, cycle ++ star, forceLoop)
      assert(got == ufComponents(16, cycle ++ star))
      assert((0 to 9).forall(v => got(v.toLong) == 0L) &&
        (10 to 15).forall(v => got(v.toLong) == 10L))
      // Edge-free graph: round 0's changed==0 exit (certificate skipped).
      assert(ccOf(7, Nil, forceLoop) == (0L until 7L).map(v => v -> v).toMap)
    }
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
