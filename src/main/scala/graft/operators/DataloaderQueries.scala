package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataloader-preparation operators — the steps between a selected corpus
  * and the training job's input pipeline: positional duplicate-span
  * detection (the exact-substring-dedup signal), length-bucketed batching
  * efficiency, overlapping retrieval chunking, deterministic per-group
  * sampling (reusing the `graft_topk` aggregate), and per-source vocabulary
  * growth.
  *
  * Scale notes per query:
  *   - q106: explode positional shingles (linear), document-frequency
  *     groupBy(shingle), join back keyed by shingle; the island windows are
  *     PARTITIONED BY doc_id — per-doc cardinality is bounded by document
  *     length, never by corpus size.
  *   - q107: one linear projection + a groupBy over ~10 bucket keys with
  *     map-side partial aggregation; the corpus max-length joins in as a
  *     bounded single-row broadcast (the q36/q95/q96 pattern).
  *   - q108: per-row sequence explode — output rows ≈ n_tokens/Stride per
  *     doc, linear in corpus token count; no shuffle at all before the
  *     final presentation sort.
  *   - q109: the whole point — sampling per group WITHOUT a per-group
  *     global sort: `graft_topk` keeps k-bounded heaps map-side and the
  *     shuffle carries ≤ k rows per (lang, partition). The row_number
  *     window oracle is the plan this replaces.
  *   - q110: two keyed aggregations ((source, tok) then source) — both
  *     shuffles uniform and linear.
  *
  * Determinism: ratios round through DECIMAL then cast DOUBLE (the Q.out*
  * contract); q108/q109 rank by md5 hex, identical in both engines; q109's
  * numeric sort key is the first 13 md5 hex digits (52 bits — exact in
  * DOUBLE), whose numeric order equals the oracle's lexicographic order on
  * the same fixed-length lowercase hex prefix.
  */
object DataloaderQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** q108 retrieval-chunking geometry: window/stride in tokens. Interpolated
    * into BOTH sides so they cannot drift. */
  private val ChunkW = 32
  private val ChunkS = 24

  /** q109 sample size per language. */
  private val SampleK = 20

  /** q116 posting-list cap and informative document-frequency band
    * (interpolated into both sides). */
  private val PostK = 5
  private val DfLo = 25
  private val DfHi = 400

  /** q107 bucket boundaries (powers of two). The top bucket is a catch-all:
    * the synthetic corpus tops out well below it, and at real scale anything
    * longer is truncated by the packing step (q87) before batching. */
  private val Buckets = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)

  lazy val defs: Seq[QueryDef] = Seq(
    // ---- q106: duplicate-SPAN detection — the positional signal behind
    // exact substring dedup (train-data dedup a la suffix-array methods):
    // not "what share of my shingles is duplicated" (q93) but "where are the
    // contiguous runs of cross-document-duplicated text, and how long is the
    // longest". Positional 3-token shingles keep their offset; a shingle
    // duplicated across >=2 docs marks its position; consecutive marked
    // positions merge into spans via the classic islands trick (pos minus
    // per-doc rank is constant within an island). A span of L marked
    // positions covers L+2 tokens. ----
    QueryDef(
      "q106_duplicate_spans",
      (s, dir) => {
        val base = docs(s, dir).withColumn("toks", split(col("text"), " "))
        val pos = base
          // posexplode over the codegen'd shingle array (plans/GramShingles,
          // round 8) replaces the struct-building HOF: posexplode's 0-based
          // ordinal + 1 IS the old 1-based pos, and the expression is total
          // on short arrays (empty → no rows), subsuming the size>=3 guard.
          .select(col("doc_id"),
            posexplode(graft.plans.GramShingles.shingles(col("toks"), 3)))
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
            col("col").as("sh"))
        val docFreq = pos.select("doc_id", "sh").distinct()
          .groupBy("sh").agg(count(lit(1)).as("df"))
        val dupPos = pos.join(docFreq, Seq("sh")).filter(col("df") >= 2)
        // Islands: window partitioned by doc_id — bounded by doc length.
        val wDoc = Window.partitionBy("doc_id").orderBy("pos")
        val spans = dupPos
          .withColumn("grp", col("pos") - row_number().over(wDoc))
          .groupBy("doc_id", "grp")
          .agg(count(lit(1)).as("run_len"))
        val perDoc = spans.groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            (max(col("run_len")) + 2L).as("max_span_tokens"),
            sum(col("run_len")).as("n_dup_pos"))
        base.select(col("doc_id"),
          when(size(col("toks")) >= 3, size(col("toks")).cast("long") - 2L)
            .otherwise(0L).as("n_pos"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_pos"),
            coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
            coalesce(
              Q.out6(col("n_dup_pos").cast("double") / col("n_pos")),
              lit(0.0)).as("dup_ratio"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        pos AS (
          SELECT doc_id, CAST(i AS BIGINT) AS pos,
                 concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]) AS sh
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 2)) AS i
                FROM tok WHERE len(toks) >= 3)
        ),
        docfreq AS (
          SELECT sh, COUNT(*) AS df
          FROM (SELECT DISTINCT doc_id, sh FROM pos) GROUP BY sh
        ),
        duppos AS (
          SELECT doc_id, pos FROM pos JOIN docfreq USING (sh) WHERE df >= 2
        ),
        spans AS (
          SELECT doc_id,
                 pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
          FROM duppos
        ),
        runs AS (
          SELECT doc_id, grp, COUNT(*) AS run_len
          FROM spans GROUP BY doc_id, grp
        ),
        perdoc AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_spans,
                 CAST(MAX(run_len) + 2 AS BIGINT) AS max_span_tokens,
                 CAST(SUM(run_len) AS BIGINT) AS n_dup_pos
          FROM runs GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END
                 AS BIGINT) AS n_pos,
               COALESCE(p.n_dup_pos, 0) AS n_dup_pos,
               COALESCE(p.n_spans, 0) AS n_spans,
               COALESCE(p.max_span_tokens, 0) AS max_span_tokens,
               COALESCE(CAST(CAST(CAST(p.n_dup_pos AS DOUBLE) /
                 (CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END)
                 AS DECIMAL(38,6)) AS DOUBLE), 0.0) AS dup_ratio
        FROM tok t LEFT JOIN perdoc p USING (doc_id)
        ORDER BY t.doc_id
      """.stripMargin.trim)),

    // ---- q107: length-bucketed batching efficiency — bucket documents by
    // next-power-of-two token length and report the padding each bucket
    // wastes versus padding everything to the corpus max (the naive fixed-
    // length dataloader). The bucket boundary CASE chain is integer-exact on
    // both sides (a float log2 could round differently at exact powers of
    // two). ----
    QueryDef(
      "q107_length_buckets",
      (s, dir) => {
        val t = docs(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n"))
        val bucket = Buckets.reverse
          .foldLeft(lit(2L * Buckets.last): org.apache.spark.sql.Column) {
            (acc, b) => when(col("n") <= b, lit(b)).otherwise(acc)
          }
        val maxLen = t.agg(max(col("n")).as("max_n"))
        t.withColumn("bucket", bucket)
          .crossJoin(broadcast(maxLen))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n")).as("n_tokens"),
            sum(col("bucket") - col("n")).as("bucket_waste"),
            sum(col("max_n") - col("n")).as("fixed_waste"))
          .select(col("bucket"), col("n_docs"), col("n_tokens"),
            col("bucket_waste"), col("fixed_waste"),
            Q.out6(col("n_tokens").cast("double") /
              (col("bucket") * col("n_docs"))).as("utilization"))
          .orderBy("bucket")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n
          FROM documents
        ),
        b AS (
          SELECT doc_id, n,
                 CASE ${Buckets.map(b => s"WHEN n <= $b THEN $b")
                   .mkString(" ")} ELSE ${2 * Buckets.last} END AS bucket
          FROM t
        ),
        m AS (SELECT MAX(n) AS max_n FROM t)
        SELECT bucket,
               COUNT(*) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(SUM(bucket - n) AS BIGINT) AS bucket_waste,
               CAST(SUM(max_n - n) AS BIGINT) AS fixed_waste,
               CAST(CAST(CAST(SUM(n) AS DOUBLE) / (bucket * COUNT(*))
                 AS DECIMAL(38,6)) AS DOUBLE) AS utilization
        FROM b CROSS JOIN m
        GROUP BY bucket
        ORDER BY bucket
      """.stripMargin.trim)),

    // ---- q108: overlapping retrieval chunking (RAG indexing): cut each
    // document into ChunkW-token windows advancing by ChunkS tokens (the
    // final window is allowed to be short), fingerprint each chunk. Chunk
    // count is integer math on both sides; `slice`/`list_slice` both clamp
    // at the document end. ----
    QueryDef(
      "q108_rag_chunking",
      (s, dir) => {
        docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("n", size(col("toks")).cast("long"))
          .withColumn("n_chunks",
            when(col("n") <= ChunkW, 1L)
              .otherwise(expr(s"1 + (n - $ChunkW + $ChunkS - 1) DIV $ChunkS")))
          .select(col("doc_id"), col("toks"), col("n"),
            explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
          .withColumn("start_tok", col("chunk_id") * ChunkS + 1L)
          .withColumn("chunk_tokens",
            least(lit(ChunkW.toLong), col("n") - col("chunk_id") * ChunkS))
          .withColumn("fp",
            md5(concat_ws(" ",
              expr(s"slice(toks, CAST(start_tok AS INT), $ChunkW)"))))
          .select("doc_id", "chunk_id", "start_tok", "chunk_tokens", "fp")
          .orderBy("doc_id", "chunk_id")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n
          FROM documents
        ),
        c AS (
          SELECT doc_id, toks, n,
                 unnest(generate_series(0,
                   CASE WHEN n <= $ChunkW THEN 0
                        ELSE (n - $ChunkW + $ChunkS - 1) // $ChunkS END))
                   AS chunk_id
          FROM t
        )
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(chunk_id * $ChunkS + 1 AS BIGINT) AS start_tok,
               CAST(least($ChunkW, n - chunk_id * $ChunkS) AS BIGINT)
                 AS chunk_tokens,
               md5(array_to_string(list_slice(toks,
                 chunk_id * $ChunkS + 1, chunk_id * $ChunkS + $ChunkW), ' '))
                 AS fp
        FROM c
        ORDER BY doc_id, chunk_id
      """.stripMargin.trim)),

    // ---- q109: deterministic per-language sampling — uniform-by-hash
    // selection of SampleK docs per language, REUSING the `graft_topk`
    // aggregate (q105) instead of the row_number window the oracle is
    // written with. Sort key: first 13 md5 hex digits of (doc_id ':' text)
    // as a 52-bit integer (exact in DOUBLE), negated so "top k by score"
    // means "k smallest hashes"; numeric order on the integer equals
    // lexicographic order on the fixed-length lowercase hex prefix, which is
    // what the oracle sorts by. Ties (hash-prefix collisions) break by
    // smaller doc_id on both sides. ----
    QueryDef(
      "q109_hash_sample",
      (s, dir) => {
        graft.plans.VectorFunctions.register(s)
        docs(s, dir)
          .withColumn("h",
            expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 13), 16, 10) AS BIGINT)"))
          .groupBy(col("lang"))
          .agg(expr(s"graft_topk(CAST(-h AS DOUBLE), doc_id, $SampleK)")
            .as("top"))
          .select(col("lang"), posexplode(col("top")).as(Seq("pos", "e")))
          .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
            col("e.id").as("doc_id"))
          .orderBy("lang", "rank")
      },
      Some(s"""
        SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
        FROM (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY substr(md5(concat(CAST(doc_id AS VARCHAR), ':', text)), 1, 13),
                            doc_id) AS rank
          FROM documents)
        WHERE rank <= $SampleK
        ORDER BY lang, rank
      """.stripMargin.trim)),

    // ---- q110: per-source vocabulary growth — token volume, distinct
    // types, hapax legomena (frequency-1 types: the Heaps'-law tail that
    // dominates web-corpus vocabulary), and type/token ratio. Two keyed
    // linear aggregations; nothing quadratic. ----
    QueryDef(
      "q110_vocab_growth",
      (s, dir) => {
        docs(s, dir)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("source")
          .agg(sum(col("cnt")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            col("n_hapax"),
            Q.out6(col("n_types").cast("double") / col("n_tokens"))
              .as("type_token_ratio"))
          .orderBy("source")
      },
      Some("""
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents
        ),
        f AS (
          SELECT source, tok, COUNT(*) AS cnt FROM tok GROUP BY source, tok
        )
        SELECT source,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hapax,
               CAST(CAST(CAST(COUNT(*) AS DOUBLE) / SUM(cnt)
                 AS DECIMAL(38,6)) AS DOUBLE) AS type_token_ratio
        FROM f
        GROUP BY source
        ORDER BY source
      """.stripMargin.trim)),

    // ---- q116: inverted index with BOUNDED posting lists — the search-
    // engine build step: per informative token (mid-frequency band), the
    // top-PostK documents by term frequency. The posting-list cap reuses
    // `graft_topk` (q105/q109): map-side k-bounded heaps mean the shuffle
    // carries ≤ PostK postings per token per partition — the full
    // (token → every doc) fan-out never crosses the wire, which is the
    // difference between indexing and re-sorting the corpus at 100 TB.
    // Rank: higher tf first, ties by smaller doc_id (the repo-wide
    // contract, mirrored in the oracle's ORDER BY). ----
    QueryDef(
      "q116_inverted_index",
      (s, dir) => {
        graft.plans.VectorFunctions.register(s)
        val tf = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok", "doc_id")
          .agg(count(lit(1)).as("tf"))
        tf.groupBy("tok")
          .agg(count(lit(1)).as("df"),
            expr(s"graft_topk(CAST(tf AS DOUBLE), doc_id, $PostK)").as("top"))
          .filter(col("df") >= DfLo && col("df") <= DfHi)
          .select(col("tok"), col("df"),
            posexplode(col("top")).as(Seq("pos", "e")))
          .select(col("tok"), col("df"),
            (col("pos") + 1).cast("long").as("rank"),
            // tf rides graft_topk's DOUBLE score: exact while < 2^53, and
            // tf is bounded by ONE document's token count (< 2^31 by the
            // string/array length contract) — 22 bits of margin, so the
            // long cast is always exact (r17 cast-width audit).
            col("e.id").as("doc_id"), col("e.score").cast("long").as("tf"))
          .orderBy("tok", "rank")
      },
      Some(s"""
        WITH tf AS (
          SELECT tok, doc_id, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents)
          GROUP BY tok, doc_id
        ),
        df AS (
          SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
        )
        SELECT tok, df, CAST(rank AS BIGINT) AS rank, doc_id,
               CAST(tf AS BIGINT) AS tf
        FROM (
          SELECT tok, doc_id, tf,
                 ROW_NUMBER() OVER (PARTITION BY tok
                   ORDER BY tf DESC, doc_id) AS rank
          FROM tf) JOIN df USING (tok)
        WHERE df BETWEEN $DfLo AND $DfHi AND rank <= $PostK
        ORDER BY tok, rank
      """.stripMargin.trim)),

    // ---- q127: per-source distribution divergence — KL(source ‖ corpus)
    // over unigram distributions: the drift detector that flags a feed
    // whose token mix departs from the corpus (new spam template, language
    // shift, scraper breakage). Each term p_s·ln(p_s/p_c) is computed on
    // IDENTICAL doubles in both engines then rounds through DECIMAL(28,18)
    // BEFORE the sum (the q95 discipline — KL sums thousands of tiny
    // terms, exactly where double accumulation order would diverge).
    // Tokens absent from a source contribute 0 (the p·ln p convention);
    // every source token exists in the corpus by construction, so no
    // division by zero. Two keyed aggregations + a join keyed by token —
    // linear, and the per-source totals broadcast (#sources rows). ----
    QueryDef(
      "q127_source_divergence",
      (s, dir) => {
        val tok = docs(s, dir)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val bySrc = tok.groupBy("source", "tok").agg(count(lit(1)).as("c"))
        val srcTotals = bySrc.groupBy("source").agg(sum(col("c")).as("st"))
        val corpus = bySrc.groupBy("tok").agg(sum(col("c")).as("cc"))
        val corpusTotal = corpus.agg(sum(col("cc")).as("ct"))
        bySrc.join(corpus, "tok")
          .join(broadcast(srcTotals), "source")
          .crossJoin(broadcast(corpusTotal))
          .withColumn("term", expr(
            """CAST((CAST(c AS DOUBLE) / st) *
               ln((CAST(c AS DOUBLE) / st) / (CAST(cc AS DOUBLE) / ct))
               AS DECIMAL(28,18))"""))
          .groupBy("source")
          .agg(count(lit(1)).as("n_types"),
            Q.out6(sum(col("term")).cast("double")).as("kl_nats"))
          .orderBy("source")
      },
      Some("""
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents
        ),
        by_src AS (
          SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
        ),
        src_tot AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS st
          FROM by_src GROUP BY source
        ),
        corpus AS (
          SELECT tok, CAST(SUM(c) AS BIGINT) AS cc FROM by_src GROUP BY tok
        ),
        ct AS (SELECT CAST(SUM(cc) AS BIGINT) AS ct FROM corpus)
        SELECT source,
               COUNT(*) AS n_types,
               CAST(CAST(CAST(SUM(CAST((CAST(c AS DOUBLE) / st) *
                 ln((CAST(c AS DOUBLE) / st) / (CAST(cc AS DOUBLE) / ct))
                 AS DECIMAL(28,18))) AS DOUBLE) AS DECIMAL(38,6)) AS DOUBLE)
                 AS kl_nats
        FROM by_src
        JOIN corpus USING (tok)
        JOIN src_tot USING (source)
        CROSS JOIN ct
        GROUP BY source
        ORDER BY source
      """.stripMargin.trim))
  )
}
