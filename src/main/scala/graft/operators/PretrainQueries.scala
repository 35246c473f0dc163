package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pretraining-mix preparation operators — the steps between a curated
  * corpus (q80–q85) and the tokenizer/dataloader: sequence packing, PII
  * redaction, repetition-quality signals, the per-language sampling
  * mixture, quota selection, source-level mix stats, and cross-document
  * boilerplate detection.
  *
  * Scale notes per query:
  *   - q87 packing: the global token prefix-sum is the only op here that is
  *     sequential in nature; it is computed with the standard two-level
  *     distributed scan (per-shard window + tiny shard-offset table), NOT a
  *     single-partition window over the corpus.
  *   - q88/q89: linear per-row expression pipelines / explode+agg — shuffle
  *     only on doc_id, uniformly distributed.
  *   - q90: one groupBy(lang) over the corpus (map-side partial aggregation
  *     reduces it to #langs rows per partition) then arithmetic on the
  *     #langs-row result.
  *   - q91 quota selection: exact per-language top-quota by hash order
  *     WITHOUT a per-language global window (which would put one language =
  *     one partition at corpus scale): ranks are computed per (lang, hash
  *     prefix bucket) — parallel — and offset by an exclusive scan over the
  *     tiny (#langs × 256)-row bucket-count table, the same two-level trick
  *     as q87's prefix sum.
  *   - q92: two linear aggregations (fingerprint counts, per-source stats);
  *     every shuffle is keyed by fp or source.
  *   - q93: the classic shingle→document-frequency map-reduce — explode is
  *     linear, both shuffles are keyed by (doc_id, shingle) or shingle,
  *     uniformly distributed; nothing is quadratic in the corpus.
  *
  * Determinism: ratios round through DECIMAL then cast DOUBLE (the Q.out*
  * contract); q90 sums decimal-rounded square roots so the denominator is
  * exact and order-independent (a raw double SUM would expose the engines'
  * addition order).
  */
object PretrainQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  /** Context length for q87's concat-and-chunk packing. A power of two, so
    * even the oracle's floating-point fallback `floor(x / 256)` would be
    * exact — we still use integer division on both sides. */
  private val Ctx = 256

  /** Docs per prefix-sum shard in q87. At 100 TB raise this to ~2^20 so the
    * shard-offset table (corpus_size / ShardSize rows) stays driver-/
    * broadcast-sized while per-shard windows remain parallel. */
  private val ShardSize = 100L

  /** q96 output-shard count — interpolated into BOTH the Spark plan and the
    * oracle SQL so the two cannot drift. */
  private val NumShards = 8

  /** (lang, n_docs, weight): the temperature-0.5 mixture weights. ONE
    * implementation shared by q90 (reporting) and q91 (selection) — the
    * rounding chain (sqrt → DECIMAL(28,12) → exact decimal denominator →
    * DECIMAL(18,6) weight) is determinism-critical, and two inline copies
    * could silently diverge under a future precision change. */
  private def mixtureWeights(d: DataFrame): DataFrame =
    d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("s_dec",
        sqrt(col("n_docs").cast("double")).cast("decimal(28,12)"))
      .withColumn("denom", sum(col("s_dec")).over(Window.partitionBy(lit(1))))
      .withColumn("weight",
        (col("s_dec").cast("double") / col("denom").cast("double"))
          .cast("decimal(18,6)").cast("double"))
      .select("lang", "n_docs", "weight")

  /** (doc_id, n_tokens, st): the exclusive prefix-sum of token counts in
    * doc_id order, computed DISTRIBUTED — a per-shard running total (window
    * PARTITIONED by shard — parallel) plus an exclusive scan over the tiny
    * per-shard totals table, broadcast back. ONE implementation shared by
    * q87 (packing) and q96 (shard assignment); a corpus-wide single-
    * partition window is exactly what this decomposition exists to avoid. */
  private def tokenPrefixSum(d: DataFrame): DataFrame = {
    val t = d.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      // DIV, not `/`: Spark's `/` on longs is DOUBLE division, which
      // loses integer precision above 2^53 — exactly the id range the
      // ShardSize comment targets. Integral DIV is exact everywhere.
      expr(s"doc_id DIV $ShardSize").as("shard"))
    val wShardRun = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = t.withColumn("local_start",
      coalesce(sum(col("n_tokens")).over(wShardRun), lit(0L)))
    // Exclusive scan over shard totals: #docs/ShardSize rows, so the
    // unpartitioned window is bounded by construction (see ShardSize).
    val wShards = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy("shard")
      .agg(sum(col("n_tokens")).as("shard_toks"))
      .withColumn("shard_off",
        coalesce(sum(col("shard_toks")).over(wShards), lit(0L)))
      .select("shard", "shard_off")
    local.join(broadcast(offsets), Seq("shard"))
      .withColumn("st", col("shard_off") + col("local_start"))
      .select("doc_id", "n_tokens", "st")
  }

  lazy val defs: Seq[QueryDef] = Seq(
    // ---- q87: GPT-style concat-and-chunk sequence packing. Documents are
    // laid end-to-end in doc_id order and cut into Ctx-token windows; each
    // doc's start offset is the exclusive prefix-sum of token counts (see
    // tokenPrefixSum — the two-level distributed scan). Output: per-pack
    // occupancy stats + how many docs straddle a window boundary (those
    // lose a fraction of their tokens to truncated attention spans). ----
    QueryDef(
      "q87_sequence_packing",
      (s, dir) => {
        tokenPrefixSum(docs(s, dir))
          .withColumn("pack_id", expr(s"st DIV $Ctx"))
          .withColumn("straddles",
            expr(s"(st + n_tokens - 1) DIV $Ctx") > col("pack_id"))
          .groupBy("pack_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddlers"))
          .orderBy("pack_id")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        placed AS (
          -- CAST: DuckDB's windowed SUM(BIGINT) yields HUGEINT, and HUGEINT
          -- arithmetic would surface as float64 in the driver's dataframe.
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
          FROM t
        )
        SELECT st // $Ctx AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN (st + n_tokens - 1) // $Ctx > st // $Ctx
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        FROM placed
        GROUP BY pack_id
        ORDER BY pack_id
      """.stripMargin.trim)),

    // ---- q88: PII redaction. The synthetic corpus carries no PII, so the
    // exhibit first APPENDS deterministic fixture PII (an email for every
    // 3rd doc, a phone for every 5th — derived from doc_id, identical SQL on
    // both sides), then runs the actual operator: count + redact via regex.
    // The regexes stay in the Java-regex ∩ RE2 common subset (char classes,
    // bounded repetition) so Spark and DuckDB match identically. Per-row
    // codegen'd expressions — linear at any scale. ----
    QueryDef(
      "q88_pii_redaction",
      (s, dir) => {
        val email = "[a-z0-9.]+@[a-z0-9.]+"
        val phone = "[0-9]{3}-[0-9]{4}"
        docs(s, dir)
          .withColumn("raw", concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" user"), col("doc_id").cast("string"), lit("@mail.example")))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))))
          .withColumn("n_emails",
            size(regexp_extract_all(col("raw"), lit(email), lit(0))).cast("long"))
          .withColumn("n_phones",
            size(regexp_extract_all(col("raw"), lit(phone), lit(0))).cast("long"))
          .withColumn("clean",
            regexp_replace(regexp_replace(col("raw"), email, "<EMAIL>"), phone, "<PHONE>"))
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
            length(col("clean")).cast("long").as("n_clean_chars"),
            md5(col("clean").cast("binary")).as("clean_fp"))
          .orderBy("doc_id")
      },
      Some("""
        WITH aug AS (
          -- NOTE: no line may START with '||' — this literal goes through
          -- stripMargin, which would eat the first pipe.
          SELECT doc_id,
                 concat(text,
                   CASE WHEN doc_id % 3 = 0
                        THEN concat(' user', CAST(doc_id AS VARCHAR), '@mail.example')
                        ELSE '' END,
                   CASE WHEN doc_id % 5 = 0
                        THEN concat(' 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                        ELSE '' END) AS raw
          FROM documents
        ),
        red AS (
          SELECT doc_id, raw,
                 regexp_replace(
                   regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                   '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
          FROM aug
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}')) AS BIGINT)
                 AS n_phones,
               CAST(length(clean) AS BIGINT) AS n_clean_chars,
               md5(clean) AS clean_fp
        FROM red
        ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- q89: repetition-quality signals — the n-gram-free cousins of the
    // quality gate: distinct-token ratio (low = copy-paste spam) and the
    // share of the single most frequent token (high = boilerplate). One
    // explode → groupBy(doc_id, tok) → groupBy(doc_id): both shuffles are
    // keyed by doc_id(+token), uniformly distributed at any corpus size. ----
    QueryDef(
      "q89_repetition_signals",
      (s, dir) => {
        val counts = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        counts.groupBy("doc_id")
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max(col("c")).as("top_count"))
          .withColumn("distinct_ratio",
            (col("n_distinct").cast("double") / col("n_tokens"))
              .cast("decimal(18,6)").cast("double"))
          .withColumn("top_share",
            (col("top_count").cast("double") / col("n_tokens"))
              .cast("decimal(18,6)").cast("double"))
          .withColumn("repetitive", col("top_share") > 0.2)
          .select("doc_id", "n_tokens", "n_distinct", "top_count",
            "distinct_ratio", "top_share", "repetitive")
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        counts AS (
          SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok
        ),
        agg AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_distinct,
                 CAST(MAX(c) AS BIGINT) AS top_count
          FROM counts GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_distinct, top_count,
               CAST(CAST(CAST(n_distinct AS DOUBLE) / n_tokens AS DECIMAL(18,6)) AS DOUBLE)
                 AS distinct_ratio,
               CAST(CAST(CAST(top_count AS DOUBLE) / n_tokens AS DECIMAL(18,6)) AS DOUBLE)
                 AS top_share,
               CAST(CAST(CAST(top_count AS DOUBLE) / n_tokens AS DECIMAL(18,6)) AS DOUBLE) > 0.2
                 AS repetitive
        FROM agg
        ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- q90: temperature-based language mixture (the multilingual
    // up/down-sampling step): weight_l ∝ n_l^alpha with alpha = 0.5 — sqrt
    // because IEEE sqrt is correctly rounded (bit-identical across engines),
    // unlike pow(x, 0.3) whose libm results may differ by an ulp. Each sqrt
    // is rounded to DECIMAL(28,12) BEFORE summing, so the denominator is an
    // exact decimal sum — order-independent, immune to each engine's
    // double-addition order. floor (not round) for the target counts: floor
    // of the same double is identical everywhere; round's half-way rule is
    // not worth depending on. ----
    QueryDef(
      "q90_language_mixture",
      (s, dir) =>
        mixtureWeights(docs(s, dir))
          .withColumn("target_docs",
            floor(col("weight") * 10000).cast("long"))
          .select("lang", "n_docs", "weight", "target_docs")
          .orderBy("lang"),
      Some("""
        WITH c AS (
          SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ),
        r AS (
          SELECT lang, n_docs,
                 CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(28,12)) AS s_dec
          FROM c
        ),
        d AS (
          SELECT *, SUM(s_dec) OVER () AS denom FROM r
        )
        SELECT lang, n_docs,
               CAST(CAST(CAST(s_dec AS DOUBLE) / CAST(denom AS DOUBLE)
                 AS DECIMAL(18,6)) AS DOUBLE) AS weight,
               CAST(floor(CAST(CAST(CAST(s_dec AS DOUBLE) / CAST(denom AS DOUBLE)
                 AS DECIMAL(18,6)) AS DOUBLE) * 10000) AS BIGINT) AS target_docs
        FROM d
        ORDER BY lang
      """.stripMargin.trim)),

    // ---- q91: deterministic quota selection — materializes q90's mixture
    // into an actual per-language document pick. Selection order is
    // md5(doc_id): uniform, deterministic, engine-agnostic. The exact
    // global-per-language rank is computed WITHOUT Window.partitionBy(lang)
    // over the corpus (at 100 TB one language = one partition): rank within
    // (lang, 2-hex-char hash bucket) — 256 ordered buckets, parallel — plus
    // an exclusive bucket-count scan over the #langs×256-row table,
    // broadcast back. Fixed-length lowercase hex means (bucket, rest)
    // ordering equals full-hash ordering, so the two-level rank is exactly
    // the single-window rank the oracle computes. ----
    QueryDef(
      "q91_quota_sampling",
      (s, dir) => {
        val budget = 200
        val quotas = mixtureWeights(docs(s, dir))
          .select(col("lang"),
            floor(col("weight") * budget).cast("long").as("quota"))
        val keyed = docs(s, dir).select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string").cast("binary")).as("h"))
          .withColumn("bucket", substring(col("h"), 1, 2))
        val wBucket = Window.partitionBy("lang", "bucket").orderBy("h", "doc_id")
        val ranked = keyed.withColumn("local_rk", row_number().over(wBucket))
        // Exclusive scan over per-(lang,bucket) counts: ≤ 256 rows per lang.
        val wScan = Window.partitionBy("lang").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = keyed.groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n"))
          .withColumn("before", coalesce(sum(col("n")).over(wScan), lit(0L)))
          .select("lang", "bucket", "before")
        ranked.join(broadcast(offsets), Seq("lang", "bucket"))
          .withColumn("sel_rank", (col("before") + col("local_rk")).cast("long"))
          .join(broadcast(quotas), Seq("lang"))
          .filter(col("sel_rank") <= col("quota"))
          .select("doc_id", "lang", "sel_rank")
          .orderBy("doc_id")
      },
      Some("""
        WITH c AS (
          SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ),
        r AS (
          SELECT lang, n_docs,
                 CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(28,12)) AS s_dec
          FROM c
        ),
        d AS (
          SELECT *, SUM(s_dec) OVER () AS denom FROM r
        ),
        q AS (
          SELECT lang,
                 CAST(floor(CAST(CAST(CAST(s_dec AS DOUBLE) / CAST(denom AS DOUBLE)
                   AS DECIMAL(18,6)) AS DOUBLE) * 200) AS BIGINT) AS quota
          FROM d
        ),
        rk AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sel_rank
          FROM documents
        )
        SELECT rk.doc_id, rk.lang, CAST(rk.sel_rank AS BIGINT) AS sel_rank
        FROM rk JOIN q USING (lang)
        WHERE rk.sel_rank <= q.quota
        ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- q92: source-level mix statistics — the domain-filtering step of a
    // web-corpus pipeline (per-domain volume, duplication rate, and a
    // blocklist gate deciding which sources enter the mix). Duplication is
    // corpus-wide: a doc is a duplicate if its exact text fingerprint occurs
    // more than once ANYWHERE, attributed back to each source. Two linear
    // aggregations; the corpus-total window runs over the 20-row source
    // table. ----
    QueryDef(
      "q92_source_mix",
      (s, dir) => {
        val d = docs(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"),
            md5(col("text").cast("binary")).as("fp"))
        val fpCounts = d.groupBy("fp").agg(count(lit(1)).as("fp_n"))
        val stats = d.join(fpCounts, Seq("fp"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("fp_n") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
            sum(col("n_chars")).as("total_chars"))
        stats
          .withColumn("corpus_docs",
            sum(col("n_docs")).over(Window.partitionBy(lit(1))))
          .select(col("source"), col("n_docs"), col("n_dup_docs"),
            col("total_chars"),
            graft.operators.Q.out2(
              col("total_chars").cast("double") / col("n_docs")).as("mean_chars"),
            graft.operators.Q.out6(
              col("n_dup_docs").cast("double") / col("n_docs")).as("dup_share"),
            graft.operators.Q.out6(
              col("n_docs").cast("double") / col("corpus_docs")).as("corpus_share"),
            col("source").isin("src3", "src7").as("blocked"))
          .withColumn("keep", !col("blocked") && col("dup_share") < 0.9)
          .orderBy("source")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, source, n_chars, md5(text) AS fp FROM documents
        ),
        fpc AS (
          SELECT fp, COUNT(*) AS fp_n FROM d GROUP BY fp
        ),
        stats AS (
          SELECT source,
                 COUNT(*) AS n_docs,
                 CAST(SUM(CASE WHEN fp_n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM d JOIN fpc USING (fp)
          GROUP BY source
        ),
        tot AS (
          SELECT *, SUM(n_docs) OVER () AS corpus_docs FROM stats
        )
        SELECT source, n_docs, n_dup_docs, total_chars,
               CAST(CAST(CAST(total_chars AS DOUBLE) / n_docs AS DECIMAL(38,2))
                 AS DOUBLE) AS mean_chars,
               CAST(CAST(CAST(n_dup_docs AS DOUBLE) / n_docs AS DECIMAL(38,6))
                 AS DOUBLE) AS dup_share,
               CAST(CAST(CAST(n_docs AS DOUBLE) / corpus_docs AS DECIMAL(38,6))
                 AS DOUBLE) AS corpus_share,
               source IN ('src3', 'src7') AS blocked,
               (source NOT IN ('src3', 'src7'))
                 AND CAST(CAST(CAST(n_dup_docs AS DOUBLE) / n_docs
                   AS DECIMAL(38,6)) AS DOUBLE) < 0.9 AS keep
        FROM tot
        ORDER BY source
      """.stripMargin.trim)),

    // ---- q93: cross-document boilerplate detection — the shingle-level
    // cousin of line-dedup (CCNet-style): a 3-token shingle occurring in
    // many DISTINCT documents is boilerplate (headers, navigation chrome,
    // license blurbs); each document reports what share of its distinct
    // shingles is boilerplate. Pure map-reduce: explode shingles (linear),
    // distinct (doc, shingle) pairs, document-frequency groupBy(shingle),
    // join back keyed by shingle — both shuffles uniform, nothing quadratic.
    // Docs with <3 tokens produce no shingles and come back via the left
    // join with zeros. ----
    QueryDef(
      "q93_boilerplate_shingles",
      (s, dir) => {
        val dfThreshold = 10
        val base = docs(s, dir).withColumn("toks", split(col("text"), " "))
        val pairs = base
          // Codegen'd shingling (plans/GramShingles, round 8): total on
          // short arrays (empty result), so the old size>=3 guard — needed
          // because sequence(1, 0) DESCENDS — is subsumed; explode of the
          // empty array drops the row either way.
          .select(col("doc_id"),
            explode(graft.plans.GramShingles.shingles(col("toks"), 3))
              .as("shingle"))
          .distinct()
        val docFreq = pairs.groupBy("shingle")
          .agg(count(lit(1)).as("df"))
        val perDoc = pairs.join(docFreq, Seq("shingle"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("df") >= dfThreshold, 1L).otherwise(0L)).as("n_boiler"))
        base.select("doc_id").join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
            coalesce(
              graft.operators.Q.out6(
                col("n_boiler").cast("double") / col("n_shingles")),
              lit(0.0)).as("boiler_share"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]) AS shingle
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 2)) AS i
                FROM tok WHERE len(toks) >= 3)
        ),
        pairs AS (
          SELECT DISTINCT doc_id, shingle FROM sh
        ),
        docfreq AS (
          SELECT shingle, COUNT(*) AS df FROM pairs GROUP BY shingle
        ),
        perdoc AS (
          SELECT doc_id,
                 COUNT(*) AS n_shingles,
                 CAST(SUM(CASE WHEN df >= 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boiler
          FROM pairs JOIN docfreq USING (shingle)
          GROUP BY doc_id
        )
        SELECT t.doc_id,
               COALESCE(p.n_shingles, 0) AS n_shingles,
               COALESCE(p.n_boiler, 0) AS n_boiler,
               COALESCE(CAST(CAST(CAST(p.n_boiler AS DOUBLE) / p.n_shingles
                 AS DECIMAL(38,6)) AS DOUBLE), 0.0) AS boiler_share
        FROM tok t LEFT JOIN perdoc p USING (doc_id)
        ORDER BY t.doc_id
      """.stripMargin.trim)),

    // ---- q95: unigram surprisal — the perplexity-proxy quality filter
    // (CCNet-style LM scoring, with the corpus's own unigram model standing
    // in for the external LM): per doc, the mean negative log-probability of
    // its tokens under corpus unigram frequencies. High surprisal = rare-
    // token-heavy (gibberish or OOD); low = boilerplate-frequent tokens.
    // Determinism: each token's surprisal rounds through DECIMAL(28,12)
    // BEFORE the per-doc sum (decimal addition is exact and order-
    // independent; a raw double SUM would expose engine accumulation
    // order — same discipline as q90's denominator). ln itself is computed
    // on identical doubles in both engines (the q36 tf-idf precedent).
    // Scale: two linear aggregations + a broadcast-sized unigram table
    // (vocabulary ≪ corpus); the single-row total joins in via the same
    // bounded broadcast cross join as q36's corpus-size N. ----
    QueryDef(
      "q95_unigram_surprisal",
      (s, dir) => {
        val tok = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val freq = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val total = freq.agg(sum(col("cnt")).as("n"))
        // No broadcast hint on freq: the unigram table grows with corpus
        // vocabulary (Heaps' law — billions of distinct tokens on a web
        // corpus), so the planner must stay free to pick a shuffle join at
        // scale; at bench SFs it auto-broadcasts anyway. Only the single-row
        // total is a FORCED broadcast (bounded by construction).
        tok.join(freq, Seq("tok"))
          .crossJoin(broadcast(total))
          .withColumn("s_dec",
            expr("CAST(ln(CAST(n AS DOUBLE) / cnt) AS DECIMAL(28,12))"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("s_dec")).as("s_sum"),
            min(col("cnt")).as("rarest_cnt"))
          .select(col("doc_id"), col("n_tokens"),
            graft.operators.Q.out6(
              col("s_sum").cast("double") / col("n_tokens")).as("surprisal"),
            col("rarest_cnt"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        freq AS (
          SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
        ),
        tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM freq
        ),
        scored AS (
          SELECT doc_id, cnt,
                 CAST(ln(CAST(n AS DOUBLE) / cnt) AS DECIMAL(28,12)) AS s_dec
          FROM tok JOIN freq USING (tok) CROSS JOIN tot
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(CAST(CAST(SUM(s_dec) AS DOUBLE) / COUNT(*)
                 AS DECIMAL(18,6)) AS DOUBLE) AS surprisal,
               CAST(MIN(cnt) AS BIGINT) AS rarest_cnt
        FROM scored
        GROUP BY doc_id
        ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- q96: balanced output-shard assignment — the final step before
    // writing training shards: lay documents end-to-end in doc_id order and
    // cut the token stream into K contiguous shards of ~equal token mass,
    // so every dataloader worker streams the same volume. Reuses the q87
    // two-level distributed prefix sum; the corpus token total joins in via
    // a bounded single-row broadcast (the q36/q95 pattern). Each shard
    // reports its document range and its token-mass balance (n_tokens·K/T,
    // 1.0 = perfectly even). ----
    QueryDef(
      "q96_shard_assignment",
      (s, dir) => {
        val ps = tokenPrefixSum(docs(s, dir))
        // Token total from the raw corpus — one linear agg; summing over
        // the prefix-sum output would needlessly recompute both windows.
        val total = docs(s, dir)
          .agg(sum(size(split(col("text"), " ")).cast("long")).as("tt"))
        ps.crossJoin(broadcast(total))
          .withColumn("out_shard",
            expr(s"st DIV ((tt + ${NumShards - 1}) DIV $NumShards)"))
          .groupBy("out_shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"),
            graft.operators.Q.out6(
              sum(col("n_tokens")).cast("double") * NumShards / max(col("tt")))
              .as("balance"))
          .orderBy("out_shard")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        placed AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
          FROM t
        ),
        tot AS (
          SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM t
        )
        SELECT st // ((tt + ${NumShards - 1}) // $NumShards) AS out_shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc,
               CAST(CAST(CAST(SUM(n_tokens) AS DOUBLE) * $NumShards / tt
                 AS DECIMAL(38,6)) AS DOUBLE) AS balance
        FROM placed CROSS JOIN tot
        GROUP BY out_shard, tt
        ORDER BY out_shard
      """.stripMargin.trim)),

    // ---- q120: curriculum ordering — materialize the deterministic global
    // training order: documents banded by repetition quality (q89's
    // distinct-token ratio; low-quality bands first, so training anneals
    // toward clean data), shuffled *within* each band by md5. The GLOBAL
    // position comes from the two-level trick (q87/q91): ranks are computed
    // per (band, hash-prefix bucket) — parallel windows — and offset by an
    // exclusive scan over the tiny (bands × 256)-row bucket-count table;
    // the corpus itself never funnels through one partition, which is the
    // difference between writing a curriculum file and globally sorting
    // 100 TB. Band boundaries multiply the SAME decimal-rounded double by 5
    // in both engines (identical IEEE ops → identical floor). ----
    QueryDef(
      "q120_curriculum_order",
      (s, dir) => {
        val quality = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"))
          .withColumn("ratio",
            (col("n_distinct").cast("double") / col("n_tokens"))
              .cast("decimal(18,6)").cast("double"))
          .withColumn("band",
            least(lit(4L), floor(col("ratio") * 5).cast("long")))
        val keyed = quality.select(col("doc_id"), col("band"),
          md5(col("doc_id").cast("string").cast("binary")).as("h"))
          .withColumn("bucket", substring(col("h"), 1, 2))
        val wBucket = Window.partitionBy("band", "bucket").orderBy("h", "doc_id")
        val ranked = keyed.withColumn("local_rk", row_number().over(wBucket))
        // Exclusive scan across ALL (band, bucket) cells in curriculum
        // order: ≤ 5 × 256 rows, bounded by construction.
        val wScan = Window.orderBy("band", "bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = keyed.groupBy("band", "bucket")
          .agg(count(lit(1)).as("n"))
          .withColumn("before", coalesce(sum(col("n")).over(wScan), lit(0L)))
          .select("band", "bucket", "before")
        ranked.join(broadcast(offsets), Seq("band", "bucket"))
          .select((col("before") + col("local_rk")).cast("long").as("position"),
            col("doc_id"), col("band"))
          .orderBy("position")
      },
      Some("""
        WITH counts AS (
          SELECT doc_id, tok, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents)
          GROUP BY doc_id, tok
        ),
        quality AS (
          SELECT doc_id,
                 CAST(CAST(CAST(COUNT(*) AS DOUBLE) / SUM(c)
                   AS DECIMAL(18,6)) AS DOUBLE) AS ratio
          FROM counts GROUP BY doc_id
        ),
        banded AS (
          SELECT doc_id,
                 least(4, CAST(floor(ratio * 5) AS BIGINT)) AS band
          FROM quality
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY band,
                 md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS position,
               doc_id, band
        FROM banded
        ORDER BY position
      """.stripMargin.trim))
  )
}
