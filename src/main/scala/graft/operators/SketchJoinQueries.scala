package graft.operators

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
        val bloom = urgent.stat.bloomFilter("o_custkey", 100000L, 0.03)
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
        val estimate = udf((t: String) => cbc.value.estimateCount(t))
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
    // distinct-token-set pairs with Jaccard > 0.8, where candidate pairs
    // come from an EQUI-join on rare "prefix" tokens instead of set×set.
    // Under any total token order, two sets with J > t MUST share a token
    // within their first (s − ⌈t·s⌉ + 1) tokens — so the equi-join is
    // provably complete, and the ORACLE proves it: the SQL side is the
    // naive quadratic join with no prefix logic at all; hash-equality means
    // no pair was pruned away. Order = document frequency ascending
    // (rarest-first minimizes candidates); the df-rank window runs over the
    // VOCABULARY table (tiny relative to any corpus — the q35 caveat), and
    // prefix length uses integer math: ⌈0.8s⌉ = (4s+4) DIV 5. This is the
    // exact-join complement of q50's MinHash approximation: same shuffle-
    // bounded shape (explode prefixes → keyed join → verify candidates),
    // zero false negatives. ----
    QueryDef(
      "q122_prefix_jaccard_join",
      (s, dir) => {
        val sets = Tables.read(s, dir, "documents")
          .select(sort_array(array_distinct(split(col("text"), " ")))
            .as("toks"), col("doc_id"))
          .groupBy("toks").agg(min(col("doc_id")).as("sid"))
          .withColumn("sz", size(col("toks")).cast("long"))
        val ord = sets.select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n_sets"))
          .withColumn("ord",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy("n_sets", "tok")))
          .select("tok", "ord")
        val ordered = sets.select(col("sid"), explode(col("toks")).as("tok"))
          .join(broadcast(ord), "tok")
          .groupBy("sid")
          .agg(expr("transform(sort_array(collect_list(struct(ord, tok))), x -> x.tok)")
            .as("otoks"))
        val prefixes = ordered.join(sets.select("sid", "sz"), "sid")
          .withColumn("p", col("sz") - expr("(4 * sz + 4) DIV 5") + 1L)
          .select(col("sid"),
            explode(expr("slice(otoks, 1, CAST(p AS INT))")).as("tok"))
        val cands = prefixes.as("a")
          .join(prefixes.as("b"), col("a.tok") === col("b.tok") &&
            col("a.sid") < col("b.sid"))
          .select(col("a.sid").as("sid_a"), col("b.sid").as("sid_b"))
          .distinct()
        val side = sets.select(col("sid"), col("toks"), col("sz"))
        cands
          .join(side.select(col("sid").as("sid_a"), col("toks").as("ta"),
            col("sz").as("n_a")), "sid_a")
          .join(side.select(col("sid").as("sid_b"), col("toks").as("tb"),
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
        WITH t AS (
          SELECT list_sort(list_distinct(string_split(text, ' '))) AS toks,
                 doc_id
          FROM documents
        ),
        sets AS (
          SELECT toks, MIN(doc_id) AS sid, CAST(len(toks) AS BIGINT) AS sz
          FROM t GROUP BY toks
        )
        SELECT a.sid AS sid_a, b.sid AS sid_b,
               a.sz AS n_a, b.sz AS n_b,
               CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
               CAST(CAST(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (a.sz + b.sz - len(list_intersect(a.toks, b.toks)))
                 AS DECIMAL(9,6)) AS DOUBLE) AS jac
        FROM sets a JOIN sets b ON a.sid < b.sid
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / (a.sz + b.sz - len(list_intersect(a.toks, b.toks))) > 0.8
        ORDER BY sid_a, sid_b
      """.stripMargin.trim))
  )
}
