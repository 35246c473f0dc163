package graft.operators

import scala.util.chaining._

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic-structure joins (100 TB shuffle-avoidance toolkit): a Bloom
  * filter built from one side prunes the other side BEFORE the shuffle —
  * the pattern behind runtime row-group skipping and semi-join pushdown.
  * Sketch estimates are engine-internal → rows-only queries, with their
  * containment/error contracts enforced in SketchJoinSpec. */
object SketchJoinQueries {
  import Q._

  lazy val defs: Seq[QueryDef] = Seq(
    // ---- Bloom-filter pre-join pruning: candidates ⊇ true matches; the
    // exact join afterwards removes false positives. ----
    QueryDef(
      "q72_bloom_prefilter",
      (s, dir) => {
        val orders = Tables.read(s, dir, "orders")
        val customers = Tables.read(s, dir, "customer")
        val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
        // stat.bloomFilter NPEs when ZERO ITEMS reach the aggregate (Spark
        // 4.1.2: BloomFilterAggregate's zero-item buffer is null and the
        // driver deserializes it unguarded — "Cannot read the array length
        // because buf is null"). That happens for an empty build slice AND
        // for a non-empty slice whose build keys are all null (the agg
        // skips nulls — r14 ADVICE), so the emptiness probe runs on the
        // ACTUAL build keys: the non-null o_custkey slice, which is also
        // what the non-empty branch feeds the filter. Both degenerate
        // inputs get the semantically-exact substitute — a fresh filter
        // over zero items, mightContain false for every key. Branch on
        // emptiness EXPLICITLY rather than catching the NPE: a blanket
        // catch would also swallow an NPE from any other driver-side cause
        // (a future Spark version, a codegen bug) and silently convert it
        // into an always-false filter — an empty join result instead of a
        // visible failure (r13 ADVICE). isEmpty is a LIMIT-1 probe, cheap
        // next to the full aggregation the non-empty branch runs.
        val urgentKeys = urgent.filter(col("o_custkey").isNotNull)
        val bloom =
          if (urgentKeys.isEmpty)
            org.apache.spark.util.sketch.BloomFilter.create(100000L, 0.03)
          else urgentKeys.stat.bloomFilter("o_custkey", 100000L, 0.03)
        val bbc = s.sparkContext.broadcast(bloom)
        val mightContain = udf((k: Long) => bbc.value.mightContain(k))
        val candidates = customers.filter(mightContain(col("c_custkey")))
        val exact = customers.join(urgent, customers("c_custkey") === urgent("o_custkey"),
          "left_semi")
        candidates.groupBy("c_mktsegment").agg(count(lit(1)).as("bloom_candidates"))
          .join(exact.groupBy("c_mktsegment").agg(count(lit(1)).as("exact_buyers")),
            Seq("c_mktsegment"), "left")
          .orderBy("c_mktsegment")
      }),

    // ---- Count-Min Sketch frequency estimates next to exact counts ----
    QueryDef(
      "q73_cms_frequencies",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val cms = e.stat.countMinSketch("event_type", 0.001, 0.99, 42)
        val cbc = s.sparkContext.broadcast(cms)
        // CountMinSketch skips nulls at BUILD time (Spark's agg updates on
        // non-null only), so a null group key has no estimate — return null
        // rather than NPE inside estimateCount (null-bearing sweep, r13).
        val estimate = udf((t: String) => Option(t).map(cbc.value.estimateCount(_)))
        e.groupBy("event_type").agg(count(lit(1)).as("exact"))
          .withColumn("cms_estimate", estimate(col("event_type")))
          .orderBy("event_type")
      }),

    // ---- TPC-H Q7 shape: trade flows between distinct nation pairs ----
    QueryDef(
      "q74_nation_trade_flows",
      (s, dir) => {
        val l = Tables.read(s, dir, "lineitem")
        val o = Tables.read(s, dir, "orders")
        val c = Tables.read(s, dir, "customer")
        val su = Tables.read(s, dir, "supplier")
        val n1 = broadcast(Tables.read(s, dir, "nation")
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation")))
        val n2 = broadcast(Tables.read(s, dir, "nation")
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation")))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .join(n1, c("c_nationkey") === col("ck"))
          .join(n2, su("s_nationkey") === col("sk"))
          .filter(col("cust_nation") < col("supp_nation"))
          .withColumn("yr", year(col("o_orderdate")).cast("long"))
          .groupBy("cust_nation", "supp_nation", "yr")
          .agg(out6(sum(dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,4)") - dec4(col("l_discount"))))).as("revenue"),
            count(lit(1)).as("n_items"))
          .filter(col("n_items") >= 20)
          .orderBy("cust_nation", "supp_nation", "yr")
      },
      Some("""
        SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,6)) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n1.n_name < n2.n_name
        GROUP BY cust_nation, supp_nation, yr
        HAVING COUNT(*) >= 20
        ORDER BY cust_nation, supp_nation, yr
      """.stripMargin.trim)),

    // ---- Prefix-filtered EXACT set-similarity join (PPJoin shape): all
    // distinct 3-gram-SHINGLE-set pairs with Jaccard > 0.8, where candidate
    // pairs come from an EQUI-join on rare "prefix" shingles instead of
    // set×set. Under any total order, two sets with J > t MUST share an
    // element within their first (s − ⌈t·s⌉ + 1) elements — the equi-join
    // is provably complete, and the ORACLE proves it: the SQL side is the
    // naive quadratic join with no prefix logic at all; hash-equality means
    // no pair was pruned. Shingles, not tokens, deliberately: prefix
    // filtering needs an element universe that GROWS with the corpus
    // (measured here: 27k shingles / 5k sets at sf0.1 → 122k candidates vs
    // 12.5M quadratic, a 100× prune; raw tokens saturate at the 31-word
    // fixture vocabulary and would generate MORE than quadratic). Rarity
    // order needs no global rank — each set sorts its own shingles by the
    // (df, shingle) struct, so there is no corpus-wide window anywhere.
    // A size filter (J ≥ t ⇒ t ≤ |A|/|B| ≤ 1/t, integer-exact 4/5 form)
    // prunes candidates before verification. ⌈0.8s⌉ = (4s+4) DIV 5. This
    // is the exact-join complement of q50's MinHash approximation: same
    // shuffle-bounded shape, zero false negatives. ----
    QueryDef(
      "q122_prefix_jaccard_join",
      (s, dir) => {
        val sets = Tables.read(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), sort_array(array_distinct(
            // Codegen'd shingling (plans/GramShingles) — byte-identical to
            // the transform(sequence...)+concat_ws HOF form it replaced
            // (round 8; equivalence pinned in SketchSpec).
            graft.plans.GramShingles.shingles(col("toks"), 3))).as("shs"))
          .groupBy("shs").agg(min(col("doc_id")).as("sid"))
          .withColumn("sz", size(col("shs")).cast("long"))
          // Materialize ONCE: five consumers below (df, ordered, the
          // prefix self-join's two sides, and both verify sides) would
          // otherwise each replay tokenize → shingle → two aggregations —
          // the exact recompute shape q78's maskPairs fix established
          // (BASELINE.md round-2 notes). lazyLocalCheckpoint = lazy (eager
          // would run the pipeline at DataFrame construction, during
          // schema/plan-only inspections — the q78 lesson) + the plan PIN
          // that keeps the originating SQLMetric accumulators reachable;
          // without the pin this exact query logged `ERROR DAGScheduler:
          // ... non-existent accumulator` 125× under a 3 GiB heap (see
          // SessionCache.pin). A plain persist() was tried and rejected:
          // it keeps the full lineage, so it fixes the ERROR but re-plans
          // the whole subtree per consumer (q133 5.3 s → 8.7 s measured).
          // #distinct-sets rows.
          .pipe(graft.SessionCache.lazyLocalCheckpoint("q122-shingle-sets"))
        val df = sets.select(explode(col("shs")).as("sh"))
          .groupBy("sh").agg(count(lit(1)).as("n_sets"))
        // No broadcast hint: the shingle-df table grows with the corpus —
        // the planner must stay free to shuffle-join at scale.
        val ordered = sets.select(col("sid"), explode(col("shs")).as("sh"))
          .join(df, "sh")
          .groupBy("sid")
          .agg(expr("transform(sort_array(collect_list(struct(n_sets, sh))), x -> x.sh)")
            .as("oshs"))
        // posexplode keeps each prefix element's 0-based POSITION in the
        // rarity order, enabling PPJoin's positional refinement below: at
        // the FIRST element two sets share, every common element is that
        // element or later in BOTH lists, so overlap ≤ 1 + min(remaining).
        // J > 4/5 needs overlap ≥ (4·(|A|+|B|)) DIV 9 + 1 (integer-exact:
        // 9·inter > 4·(|A|+|B|)); a candidate row failing the bound at a
        // LATER shared element may be discarded wrongly, but the
        // first-shared-element row always passes for a true pair and the
        // distinct() needs only one survivor — completeness is preserved
        // (and the naive-quadratic oracle proves it round-trip).
        val prefixes = ordered.join(sets.select("sid", "sz"), "sid")
          .withColumn("p", col("sz") - expr("(4 * sz + 4) DIV 5") + 1L)
          .select(col("sid"), col("sz"),
            posexplode(expr("slice(oshs, 1, CAST(p AS INT))")).as(Seq("pos", "sh")))
        val cands = prefixes.as("a")
          .join(prefixes.as("b"), col("a.sh") === col("b.sh") &&
            col("a.sid") < col("b.sid") &&
            col("a.sz") * 5L >= col("b.sz") * 4L &&
            col("b.sz") * 5L >= col("a.sz") * 4L &&
            expr("1 + least(a.sz - a.pos - 1, b.sz - b.pos - 1) >= " +
              "((a.sz + b.sz) * 4) DIV 9 + 1"))
          .select(col("a.sid").as("sid_a"), col("b.sid").as("sid_b"))
          .distinct()
        val side = sets.select(col("sid"), col("shs"), col("sz"))
        cands
          .join(side.select(col("sid").as("sid_a"), col("shs").as("ta"),
            col("sz").as("n_a")), "sid_a")
          .join(side.select(col("sid").as("sid_b"), col("shs").as("tb"),
            col("sz").as("n_b")), "sid_b")
          .withColumn("inter",
            size(array_intersect(col("ta"), col("tb"))).cast("long"))
          .withColumn("jac", col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")))
          .filter(col("jac") > 0.8)
          .select(col("sid_a"), col("sid_b"), col("n_a"), col("n_b"),
            col("inter"), col("jac").cast("decimal(9,6)").cast("double")
              .as("jac"))
          .orderBy("sid_a", "sid_b")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]) AS s
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 2)) AS i
                FROM tok WHERE len(toks) >= 3)
        ),
        docsets AS (
          SELECT doc_id, list_sort(list(DISTINCT s)) AS shs
          FROM sh GROUP BY doc_id
        ),
        sets AS (
          SELECT shs, MIN(doc_id) AS sid, CAST(len(shs) AS BIGINT) AS sz
          FROM docsets GROUP BY shs
        )
        SELECT a.sid AS sid_a, b.sid AS sid_b,
               a.sz AS n_a, b.sz AS n_b,
               CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) AS inter,
               CAST(CAST(CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
                 / (a.sz + b.sz - len(list_intersect(a.shs, b.shs)))
                 AS DECIMAL(9,6)) AS DOUBLE) AS jac
        FROM sets a JOIN sets b ON a.sid < b.sid
        WHERE CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
              / (a.sz + b.sz - len(list_intersect(a.shs, b.shs))) > 0.8
        ORDER BY sid_a, sid_b
      """.stripMargin.trim)),

    // ---- Join-key skew audit — the diagnostic that decides when the
    // salting toolkit (functions/Salting) is worth its cost: per candidate
    // join key of lineitem, the row mass of the heaviest keys and how far
    // the distribution deviates from uniform. skew = max_rows * n_keys /
    // total_rows (1.0 = perfectly even) rounds through the Q.out contract;
    // heavy-hitter rows are the exact top 5 keys per column by (rows desc,
    // key) — all plain keyed aggregations over a melted (col, key) frame,
    // one scan of the fact table. ----
    QueryDef(
      "q123_skew_audit",
      (s, dir) => {
        graft.plans.VectorFunctions.register(s)
        val melted = Tables.read(s, dir, "lineitem").select(
          explode(array(
            struct(lit("l_orderkey").as("c"), col("l_orderkey").as("k")),
            struct(lit("l_partkey").as("c"), col("l_partkey").as("k")),
            struct(lit("l_suppkey").as("c"), col("l_suppkey").as("k")))))
          .select(col("col.c").as("c"), col("col.k").as("k"))
        val perKey = melted.groupBy("c", "k").agg(count(lit(1)).as("krows"))
        val stats = perKey.groupBy("c")
          .agg(count(lit(1)).as("n_keys"), sum(col("krows")).as("total"),
            max(col("krows")).as("max_rows"))
        val top = perKey
          .groupBy("c")
          .agg(expr("graft_topk(CAST(krows AS DOUBLE), k, 5)").as("t"))
          .select(col("c"), posexplode(col("t")).as(Seq("pos", "e")))
          .select(col("c"), (col("pos") + 1).cast("long").as("rank"),
            // key_rows rides graft_topk's DOUBLE score and IS corpus-linear
            // (the mega-key class): exact to 2^53 ≈ 9e15 rows — above the
            // 100 TB row count — and past it the count rounds to an even
            // neighbor, a ±1-row tolerance this DIAGNOSTIC (skew ranking)
            // absorbs by design (r17 cast-width audit).
            col("e.id").as("key"), col("e.score").cast("long").as("key_rows"))
        top.join(broadcast(stats), "c")
          .select(col("c"), col("rank"), col("key"), col("key_rows"),
            col("n_keys"), col("total"),
            Q.out6(col("max_rows").cast("double") * col("n_keys") /
              col("total")).as("skew"))
          .orderBy("c", "rank")
      },
      Some("""
        WITH melted AS (
          SELECT u.c, u.k FROM lineitem,
          LATERAL (VALUES
            ('l_orderkey', l_orderkey),
            ('l_partkey', l_partkey),
            ('l_suppkey', l_suppkey)) AS u(c, k)
        ),
        perkey AS (
          SELECT c, k, COUNT(*) AS krows FROM melted GROUP BY c, k
        ),
        stats AS (
          SELECT c, COUNT(*) AS n_keys, CAST(SUM(krows) AS BIGINT) AS total,
                 CAST(MAX(krows) AS BIGINT) AS max_rows
          FROM perkey GROUP BY c
        ),
        top AS (
          SELECT c, k, krows,
                 ROW_NUMBER() OVER (PARTITION BY c
                   ORDER BY krows DESC, k) AS rank
          FROM perkey
        )
        SELECT t.c, CAST(t.rank AS BIGINT) AS rank, t.k AS key,
               CAST(t.krows AS BIGINT) AS key_rows,
               s.n_keys, s.total,
               CAST(CAST(CAST(s.max_rows AS DOUBLE) * s.n_keys / s.total
                 AS DECIMAL(38,6)) AS DOUBLE) AS skew
        FROM top t JOIN stats s USING (c)
        WHERE t.rank <= 5
        ORDER BY c, rank
      """.stripMargin.trim))
  )
}
