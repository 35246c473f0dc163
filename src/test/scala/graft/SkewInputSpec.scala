package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute end-to-end — and stay SANE — when the
  * join/group keys carry duplicate-key SKEW pathologies.
  *
  * Fifth axis of the input-robustness matrix (zero rows → null values →
  * degenerate vectors → boundary scalars → THIS). The first four axes
  * poison structure and magnitude; this one poisons KEY DISTRIBUTION —
  * the classes a 100 TB corpus delivers as a matter of course (one retail
  * mega-order, one bot account, one boilerplate page crawled everywhere)
  * and the classes AQE skew-join and the salting notes exist for, which
  * until this spec were exercised only by the organic (near-uniform)
  * fixtures. VERDICT r15 "next round" task 2; fixture shapes are the
  * judge's own: one order with ~10⁵ lineitems, one user holding over half
  * of events, one text shared by ~10³ documents — plus a vector twin (one
  * embedding shared by a third of the corpus, the IVF-cell/LSH-bucket
  * overload class).
  *
  *   - lineitem: the MEGA-ORDER — one existing orderkey gains 100,000
  *     synthetic lineitems (one source row per distinct l_partkey × 500
  *     copies, so the order also holds EVERY part). This is the
  *     duplicate-join-key shape: lineitem⋈orders fans 10⁵ rows into one
  *     key, per-order windows get a 10⁵-row partition, and q130's
  *     per-order self-join sees its worst legal case — bounded at
  *     C(200,2) pairs ONLY because q130 dedups to distinct parts first
  *     (the bound this spec pins as a fixture property).
  *   - events: the MEGA-USER — every even event_id reassigned to one
  *     existing user, who ends up holding ~53% of all events. Every
  *     per-user window (sessionization, gap-fill spine, funnels,
  *     trigrams) gets a majority-mass partition.
  *   - documents: the SHARED TEXT — 1,000 appended clones (250 organic
  *     docs × 4 copies, fresh doc_ids) of one fixed ~20-word boilerplate
  *     sentence. Exact dedup must collapse them; MinHash/LSH puts all
  *     1,000 in ONE band bucket (the bucket-skew worst case); exact
  *     near-dup pairs must carry the full C(1000,2) = 499,500-pair
  *     clique without a quadratic stage anywhere BEFORE the (legitimate)
  *     pair output.
  *   - embeddings: the SHARED VECTOR — every mod-3 vec_id gets vec 0's
  *     embedding (~a third of the corpus in one point): one IVF cell
  *     holds them all, every LSH bucket they map to is overloaded, and
  *     semantic dedup must collapse them to a single kept leader.
  *
  * Execution pins (all 134) prove no-crash; the semantic pins below prove
  * the skewed mass ARRIVES (nothing silently dropped) and the documented
  * skew defenses (distinct-before-pair, bucketed candidates,
  * cluster-bounded dedup) actually absorb it. Committed per the r15
  * procedure: this spec's commit is gated by a full dev/preflight.sh run
  * at its own HEAD, never folded into a round-end snapshot commit.
  */
class SkewInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Fixture constants + builder live in SkewFixture (r17: extracted so
  // the parity matrix can materialize the SAME corpus via
  // `sbt "Test/runMain graft.SkewFixtureMain"` — the shapes and their
  // rationale are documented there).
  import SkewFixture.{MegaOrder, MegaUser, SharedText}

  private lazy val skewDir: String = SkewFixture.build(spark)

  Registry.all.foreach { q =>
    test(s"${q.name} executes on duplicate-key skew") {
      // Full-column materialization, not count(): count lets Catalyst
      // prune the very expression the pathological value detonates
      // (q30's pow2_line passed a count() pin here, then aborted
      // Verify — r16 skew parity finding).
      TestSpark.materialize(q.fn(spark, skewDir))
    }
  }

  test("fixture: the mega-order holds 10^5 lineitems over all 200 parts") {
    val li = spark.read.parquet(s"$skewDir/lineitem.parquet")
      .filter(col("l_orderkey") === MegaOrder)
    assert(li.count() >= 100000L)
    // The property that bounds q130's per-order self-join at C(200,2)
    // pairs instead of C(10^5,2): distinct-parts-per-order stays at the
    // part-table size no matter how many lineitems pile onto the key.
    assert(li.select("l_partkey").distinct().count() === 200L)
  }

  test("q123 skew audit flags the mega-order as the rank-1 heavy hitter") {
    // The diagnostic that decides when salting is worth its cost must
    // actually FIND planted skew: l_orderkey's top key is the mega-order,
    // carrying ≥100k of ~106k rows, and the skew factor (max_rows ×
    // n_keys / total) reads far above the ~1.0 of the uniform organic
    // fixture.
    val audit = Registry.queries("q123_skew_audit")(spark, skewDir)
      .filter(col("c") === "l_orderkey" && col("rank") === 1)
      .head()
    assert(audit.getAs[Long]("key") === MegaOrder)
    assert(audit.getAs[Long]("key_rows") >= 100000L)
    assert(audit.getAs[Double]("skew") > 50.0,
      s"planted mega-order must read as heavy skew, got ${audit.getAs[Double]("skew")}")
  }

  test("the mega-user's majority event mass sessionizes losslessly") {
    val sess = Registry.queries("q28_sessionization")(spark, skewDir)
      .filter(col("user_id") === MegaUser)
    val evCount = sources.Tables.read(spark, skewDir, "events")
      .filter(col("user_id") === MegaUser).count()
    assert(evCount >= 500L, "fixture must put over half the events on one user")
    // Lossless: every one of the user's events lands in exactly one
    // session; the 10^2-session/10^2-event-per-session shape is organic.
    assert(sess.agg(sum(col("n_events"))).head().getLong(0) === evCount)
    assert(sess.count() >= 1L)
  }

  test("exact dedup collapses the 1000-clone shared text, drops nothing") {
    val d = Registry.queries("q32_exact_dedup")(spark, skewDir)
      .agg(sum(col("n_docs")), sum(col("exact_dups"))).head()
    val (qDocs, qDups) = (d.getLong(0), d.getLong(1))
    val docs = spark.read.parquet(s"$skewDir/documents.parquet")
    assert(qDocs === docs.count(), "clones must be counted, not dropped")
    // Within each lang, k same-text docs contribute k-1 exact dups: the
    // 1,000-clone clique alone forces this bound (first-principles from
    // the fixture, the BoundaryInputSpec idiom).
    val bound = docs.filter(col("text") === SharedText)
      .groupBy("lang").count()
      .collect().map(r => math.max(0L, r.getLong(1) - 1L)).sum
    assert(bound >= 995L, s"clone clique must span ~1000 docs, got bound $bound")
    assert(qDups >= bound,
      s"q32 reports $qDups exact dups; the shared-text clique alone forces ≥ $bound")
  }

  test("q30 pow2_line NULLs out-of-domain linenumbers instead of aliasing") {
    // r16 ADVICE (low): the `% 63` wrap mapped a 63-line order's row onto
    // 2^0 — a plausible organic-looking value on a pathological row. The
    // explicit domain window keeps 0..62 exact and reads everything beyond
    // as an honest NULL, so pathological rows stay distinguishable.
    // Red-proof: on the %63 engine the first assertion below fails (the
    // mega-order's >62 linenumbers all carried aliased powers).
    val out = Registry.queries("q30_math_functions")(spark, skewDir).cache()
    try {
      val outOfDomain = out.filter(col("l_linenumber") > 62)
      assert(outOfDomain.count() > 0L,
        "fixture must plant >62 linenumbers (mega-order hygiene ids)")
      assert(outOfDomain.filter(col("pow2_line").isNotNull).count() === 0L,
        "out-of-domain linenumbers must read NULL, never an aliased power")
      val inDomain = out.filter(col("l_linenumber").between(0, 62))
      assert(inDomain.filter(col("pow2_line").isNull).count() === 0L,
        "in-domain linenumbers must keep their exact 2^n")
      assert(out.filter(col("l_linenumber") === 2)
        .select("pow2_line").head().getLong(0) === 4L)
    } finally out.unpersist()
  }

  test("exact near-dup pairs carry the full 499,500-pair clique") {
    // 1,000 identical texts are C(1000,2) legitimate pairs — the pair
    // OUTPUT is allowed to be quadratic in the clique, the candidate
    // generation is not (identical texts collapse to ONE distinct mask
    // before any pairing; the clique re-expands only in the final
    // intra-mask self-join).
    val n = Registry.queries("q33_neardup_pairs")(spark, skewDir).count()
    assert(n >= 499500L,
      s"the shared-text clique alone is 499,500 pairs, query returned $n")
  }

  test("semantic dedup collapses the shared-vector mass to one leader") {
    // All ~167 identical vectors assign to the same IVF cell and pair at
    // cos = 1.0, so every one except the smallest id must be dropped —
    // the cluster-bounded pairwise stage absorbing a worst-case cell.
    val s = Registry.queries("q94_semantic_dedup")(spark, skewDir)
      .agg(sum(col("n_vecs")), sum(col("n_dropped"))).head()
    assert(s.getLong(0) === 500L, "every vector must reach a cluster")
    assert(s.getLong(1) >= 166L,
      s"166 of the 167 shared vectors must drop, got ${s.getLong(1)} total drops")
  }
}
