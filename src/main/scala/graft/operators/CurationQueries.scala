package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation pipeline operators beyond SURVEY §2 — the
  * operations a 100 TB pretraining-data build runs between raw scrape and
  * tokenizer: deterministic dataset splitting, benchmark decontamination,
  * stopword scrubbing, and the final composite keep/drop decision.
  *
  * Scale notes: every query here is linear in the corpus — per-doc
  * expression pipelines, broadcast joins against tiny reference sets
  * (holdout shingles, stop lists), and hash-partitioned aggregations. No
  * pairwise joins anywhere (near-dup pairing lives in q33/q50/q78).
  *
  * Determinism: splits and fingerprints hash md5 hex strings (identical in
  * Spark and DuckDB — proven by q38); ratios round through DECIMAL then cast
  * DOUBLE per the Q.out* contract.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  lazy val defs: Seq[QueryDef] = Seq(
    // ---- Deterministic train/val/test split: bucket on the first hex char
    // of md5(doc_id) → 13/16 train, 2/16 val, 1/16 test. Content-independent
    // (survives re-crawls of the same ids), engine-identical, and
    // embarrassingly parallel: the split column is a per-row expression, so
    // at 100 TB it costs one codegen'd projection — no shuffle until the
    // tiny per-split rollup. ----
    QueryDef(
      "q80_dataset_split",
      (s, dir) =>
        docs(s, dir)
          .withColumn("h1", substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1))
          .withColumn("split",
            when(col("h1") <= "c", "train")
              .when(col("h1") <= "e", "val")
              .otherwise("test"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("lang")).as("n_langs"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
          .orderBy("split"),
      Some("""
        WITH d AS (
          SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h1 FROM documents
        )
        SELECT CASE WHEN h1 <= 'c' THEN 'train'
                    WHEN h1 <= 'e' THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               COUNT(DISTINCT lang) AS n_langs,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM d
        GROUP BY split
        ORDER BY split
      """.stripMargin.trim)),

    // ---- Benchmark decontamination: flag corpus docs sharing token
    // 3-gram shingles with a holdout set (doc_id < 5 stands in for the
    // benchmark). Holdout shingles broadcast (benchmarks are tiny vs the
    // corpus); the corpus side is one explode → broadcast-semi-join →
    // groupBy, linear at 100 TB. ----
    QueryDef(
      "q81_decontamination",
      (s, dir) => {
        val toks = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val shingled = toks.withColumn("shingles",
          when(size(col("toks")) >= 3,
            expr("array_distinct(transform(sequence(0, size(toks) - 3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))"))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
        val exploded = shingled
          .select(col("doc_id"), explode_outer(col("shingles")).as("sh"))
        val holdout = broadcast(
          exploded.filter(col("doc_id") < 5).select("sh").distinct())
        exploded.filter(col("doc_id") >= 5)
          .join(holdout.withColumn("hit", lit(1L)), Seq("sh"), "left")
          .groupBy("doc_id")
          .agg(count(col("sh")).as("n_shingles"),
            coalesce(sum(col("hit")), lit(0L)).as("n_matched"))
          .withColumn("overlap",
            when(col("n_shingles") > 0,
              (col("n_matched").cast("double") / col("n_shingles"))
                .cast("decimal(18,6)").cast("double"))
              .otherwise(lit(0.0)))
          .withColumn("contaminated", col("overlap") > 0.5)
          .select("doc_id", "n_shingles", "n_matched", "overlap", "contaminated")
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3 THEN
                   list_distinct(list_transform(generate_series(1, len(toks) - 2),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS shingles
          FROM t
        ),
        ex AS (
          SELECT doc_id, u.s AS sh
          FROM sh LEFT JOIN unnest(shingles) AS u(s) ON TRUE
        ),
        hold AS (SELECT DISTINCT sh FROM ex WHERE doc_id < 5 AND sh IS NOT NULL),
        scored AS (
          SELECT e.doc_id,
                 COUNT(e.sh) AS n_shingles,
                 CAST(COALESCE(SUM(CASE WHEN h.sh IS NOT NULL THEN 1 END), 0) AS BIGINT)
                   AS n_matched
          FROM ex e LEFT JOIN hold h ON e.sh = h.sh
          WHERE e.doc_id >= 5
          GROUP BY e.doc_id
        )
        SELECT doc_id, n_shingles, n_matched,
               CASE WHEN n_shingles > 0 THEN
                 CAST(CAST(CAST(n_matched AS DOUBLE) / n_shingles AS DECIMAL(18,6)) AS DOUBLE)
               ELSE 0.0 END AS overlap,
               (CASE WHEN n_shingles > 0 THEN
                 CAST(CAST(CAST(n_matched AS DOUBLE) / n_shingles AS DECIMAL(18,6)) AS DOUBLE)
               ELSE 0.0 END) > 0.5 AS contaminated
        FROM scored
        ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- Stopword scrub (tokenizer-prep normalization): drop stopwords,
    // emit the cleaned text + removal stats. Pure per-row higher-order
    // expressions — linear, no shuffle before the ORDER BY. ----
    QueryDef(
      "q82_stopword_scrub",
      (s, dir) =>
        docs(s, dir)
          .withColumn("toks", split(col("text"), " "))
          .withColumn("kept",
            expr("filter(toks, t -> t NOT IN ('the', 'a', 'of', 'and', 'to', 'in'))"))
          .select(
            col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
            array_join(col("kept"), " ").as("clean_text"))
          .orderBy("doc_id"),
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(toks) - len(list_filter(toks,
                 t -> t NOT IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS BIGINT)
                 AS n_removed,
               array_to_string(list_filter(toks,
                 t -> t NOT IN ('the', 'a', 'of', 'and', 'to', 'in')), ' ')
                 AS clean_text
        FROM t ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- Composite curation decision: quality gates + exact-dedup
    // canonicalization in one pass. fp = md5 of the sorted distinct
    // (case-sensitive) token set; the canonical member of a fingerprint
    // group is the min doc_id AMONG GATE-PASSING members — if it were the
    // raw group minimum, a group whose lowest-id copy fails a gate would
    // lose every copy ("too_short" for the min, "exact_dup" for the rest)
    // instead of keeping one survivor. The window is keyed by fp — a
    // well-distributed shuffle at any scale. ----
    QueryDef(
      "q83_curation_pipeline",
      (s, dir) => {
        val base = docs(s, dir)
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tokens", size(col("toks")).cast("long"))
          .withColumn("mean_tok_len",
            (col("n_chars").cast("double") / col("n_tokens"))
              .cast("decimal(18,6)").cast("double"))
          .withColumn("fp",
            md5(concat_ws(" ", sort_array(array_distinct(col("toks")))).cast("binary")))
          .withColumn("quality_ok",
            col("n_tokens") >= 5 && col("mean_tok_len") <= 10)
          .withColumn("canon_id",
            min(when(col("quality_ok"), col("doc_id")))
              .over(Window.partitionBy("fp")))
        base
          .withColumn("reason",
            when(col("n_tokens") < 5, "too_short")
              .when(col("mean_tok_len") > 10, "weird_shape")
              .when(col("doc_id") =!= col("canon_id"), "exact_dup")
              .otherwise("ok"))
          .withColumn("keep", col("reason") === "ok")
          .select("doc_id", "n_tokens", "mean_tok_len", "canon_id", "reason", "keep")
          .orderBy("doc_id")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, n_chars,
                 string_split(text, ' ') AS toks,
                 md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
          FROM documents
        ),
        scored AS (
          SELECT doc_id, fp,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(CAST(CAST(n_chars AS DOUBLE) / len(toks) AS DECIMAL(18,6)) AS DOUBLE)
                   AS mean_tok_len
          FROM base
        ),
        canon AS (
          SELECT *,
                 MIN(CASE WHEN n_tokens >= 5 AND mean_tok_len <= 10
                          THEN doc_id END) OVER (PARTITION BY fp) AS canon_id
          FROM scored
        )
        SELECT doc_id, n_tokens, mean_tok_len, canon_id,
               CASE WHEN n_tokens < 5 THEN 'too_short'
                    WHEN mean_tok_len > 10 THEN 'weird_shape'
                    WHEN doc_id <> canon_id THEN 'exact_dup'
                    ELSE 'ok' END AS reason,
               (CASE WHEN n_tokens < 5 THEN 'too_short'
                     WHEN mean_tok_len > 10 THEN 'weird_shape'
                     WHEN doc_id <> canon_id THEN 'exact_dup'
                     ELSE 'ok' END) = 'ok' AS keep
        FROM canon
        ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- q97: incremental corpus ingest — the dedup decision a production
    // pipeline makes on every new crawl batch against the corpus it already
    // owns. History = docs with doc_id < 250 (their fingerprint store);
    // batch = the rest. Each batch doc classifies as dup_of_history (its
    // exact fingerprint already owned), dup_in_batch (a lower-id batch doc
    // has the same fingerprint — first-seen-wins within the batch), or new.
    // Scale: the history side is ONLY the fingerprint column (at 100 TB a
    // compact fp store, not the corpus), both joins/aggregations are keyed
    // by fp — uniformly distributed, no pairwise anything. The same shape
    // runs incrementally forever: yesterday's "new" fps append to the
    // store. ----
    QueryDef(
      "q97_incremental_ingest",
      (s, dir) => {
        val HistMax = 250L
        val d = docs(s, dir)
          .select(col("doc_id"), col("source"),
            md5(col("text").cast("binary")).as("fp"))
        val histFps = d.filter(col("doc_id") < HistMax)
          .select("fp").distinct()
        val batch = d.filter(col("doc_id") >= HistMax)
        // First-seen-wins within the batch: min doc_id per fp.
        val firstSeen = batch.groupBy("fp")
          .agg(min(col("doc_id")).as("first_id"))
        batch
          .join(firstSeen, Seq("fp"))
          .join(histFps.withColumn("in_hist", lit(true)), Seq("fp"), "left")
          .withColumn("status",
            when(col("in_hist"), "dup_of_history")
              .when(col("doc_id") > col("first_id"), "dup_in_batch")
              .otherwise("new"))
          .select("doc_id", "source", "fp", "status")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, source, md5(text) AS fp FROM documents
        ),
        hist AS (
          SELECT DISTINCT fp FROM d WHERE doc_id < 250
        ),
        batch AS (
          SELECT * FROM d WHERE doc_id >= 250
        ),
        first_seen AS (
          SELECT fp, MIN(doc_id) AS first_id FROM batch GROUP BY fp
        )
        SELECT b.doc_id, b.source, b.fp,
               CASE WHEN h.fp IS NOT NULL THEN 'dup_of_history'
                    WHEN b.doc_id > f.first_id THEN 'dup_in_batch'
                    ELSE 'new' END AS status
        FROM batch b
        JOIN first_seen f USING (fp)
        LEFT JOIN hist h ON b.fp = h.fp
        ORDER BY b.doc_id
      """.stripMargin.trim)),

    // ---- Corpus snapshot diff (data versioning): classify every doc_id
    // across two crawl snapshots as added / removed / changed / unchanged
    // by comparing content fingerprints through a FULL OUTER join. The two
    // snapshots are deterministic derivations of the fixture: the "old"
    // crawl is missing the doc_id%10==7 slice (→ added) and carries a stale
    // text for the %10==5 slice (→ changed); the "new" crawl dropped the
    // %10==4 slice (→ removed).
    //
    // Scale: fingerprints reduce each side to (key, 32-byte hash) before
    // the join — the full-outer join shuffles on doc_id and is the
    // canonical snapshot-reconciliation plan at 100 TB (both sides
    // corpus-sized; no broadcast possible, none attempted). ----
    QueryDef(
      "q99_snapshot_diff",
      (s, dir) => {
        val d = docs(s, dir)
        val prev = d.filter(col("doc_id") % 10 =!= 7)
          .withColumn("text",
            when(col("doc_id") % 10 === 5, concat(col("text"), lit(" v1")))
              .otherwise(col("text")))
          .select(col("doc_id"), md5(col("text").cast("binary")).as("old_fp"))
        val curr = d.filter(col("doc_id") % 10 =!= 4)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("new_fp"))
        prev.join(curr, Seq("doc_id"), "full_outer")
          .withColumn("status",
            when(col("old_fp").isNull, "added")
              .when(col("new_fp").isNull, "removed")
              .when(col("old_fp") =!= col("new_fp"), "changed")
              .otherwise("unchanged"))
          .select("doc_id", "status")
          .orderBy("doc_id")
      },
      Some("""
        WITH prev AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 10 = 5 THEN text || ' v1' ELSE text END)
                   AS old_fp
          FROM documents WHERE doc_id % 10 <> 7
        ),
        curr AS (
          SELECT doc_id, md5(text) AS new_fp
          FROM documents WHERE doc_id % 10 <> 4
        )
        SELECT COALESCE(prev.doc_id, curr.doc_id) AS doc_id,
               CASE WHEN old_fp IS NULL THEN 'added'
                    WHEN new_fp IS NULL THEN 'removed'
                    WHEN old_fp <> new_fp THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM prev FULL OUTER JOIN curr ON prev.doc_id = curr.doc_id
        ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- Cross-source duplication audit: Jaccard overlap of token-SET
    // fingerprints between every source pair — which scrape feeds are
    // re-serving each other's content. Docs collapse to distinct
    // (source, set-fp) first (near-dups share a token set far more often
    // than an exact text), so the fp join never touches doc×doc.
    //
    // Scale: the fp equi-join shuffles on fingerprint (per-fp source lists
    // are tiny); the counts×counts pair frame is #sources² rows — bounded
    // by the catalog of feeds, not the corpus, and documented in
    // PlanSpec's cartesian allowlist. Jaccard divides exact BIGINTs as
    // doubles (bit-identical both engines) and rounds through the Q.out*
    // contract. ----
    QueryDef(
      "q102_source_overlap",
      (s, dir) => {
        val setFp = docs(s, dir)
          .select(col("source"),
            md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
              .cast("binary")).as("fp"))
          .distinct()
        val counts = setFp.groupBy("source").agg(count(lit(1)).as("n_sets"))
        val pairs = counts.select(col("source").as("src_a"), col("n_sets").as("n_a"))
          .join(counts.select(col("source").as("src_b"), col("n_sets").as("n_b")),
            col("src_a") < col("src_b"))
        val inter = setFp.select(col("fp"), col("source").as("src_a"))
          .join(setFp.select(col("fp"), col("source").as("src_b")), "fp")
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
        pairs.join(inter, Seq("src_a", "src_b"), "left")
          .withColumn("inter", coalesce(col("inter"), lit(0L)))
          .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("inter"),
            (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
              .cast("decimal(18,9)").cast("double").as("jaccard"))
          .orderBy("src_a", "src_b")
      },
      Some("""
        WITH setfp AS (
          SELECT DISTINCT source,
                 md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS fp
          FROM documents
        ),
        counts AS (SELECT source, COUNT(*) AS n_sets FROM setfp GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
          FROM setfp a JOIN setfp b ON a.fp = b.fp AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT ca.source AS src_a, cb.source AS src_b,
               ca.n_sets AS n_a, cb.n_sets AS n_b,
               COALESCE(i.inter, 0) AS inter,
               CAST(CAST(CAST(COALESCE(i.inter, 0) AS DOUBLE)
                      / (ca.n_sets + cb.n_sets - COALESCE(i.inter, 0))
                    AS DECIMAL(18,9)) AS DOUBLE) AS jaccard
        FROM counts ca JOIN counts cb ON ca.source < cb.source
        LEFT JOIN inter i ON i.src_a = ca.source AND i.src_b = cb.source
        ORDER BY src_a, src_b
      """.stripMargin.trim)),

    // ---- q118: single-pass table profiling — the Deequ-style data-
    // validation report a pipeline runs before training: per column, row
    // count, null count, exact distinct count, min/max. The table MELTS to
    // (column, value-as-string) rows first — 5x the rows through ONE scan
    // and one shuffle keyed by column name — instead of N separate
    // aggregation passes (N scans) or N COUNT(DISTINCT)s in one aggregate
    // (an N-way Expand). min/max compare the string form (lexicographic;
    // numerics render at the full 19-digit width of a non-negative BIGINT,
    // so lexicographic == numeric for the whole legal domain; a NEGATIVE
    // value would silently invert that order, so it raises instead —
    // loud wrongness beats a wrong min). ----
    QueryDef(
      "q118_table_profile",
      (s, dir) => {
        def fixedW(c: String): org.apache.spark.sql.Column =
          when(col(c) < 0, raise_error(concat(
            lit(s"q118: negative $c breaks lexicographic min/max: "),
            col(c).cast("string"))).cast("string"))
            .otherwise(format_string("%019d", col(c)))
        val melted = docs(s, dir).select(
          explode(array(
            struct(lit("doc_id").as("col"), fixedW("doc_id").as("v")),
            struct(lit("lang").as("col"), col("lang").as("v")),
            struct(lit("n_chars").as("col"), fixedW("n_chars").as("v")),
            struct(lit("source").as("col"), col("source").as("v")),
            struct(lit("text").as("col"), col("text").as("v")))))
          .select(col("col.col").as("c"), col("col.v").as("v"))
        melted.groupBy("c")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col("v")).as("n_distinct"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"))
          .orderBy("c")
      },
      Some("""
        WITH melted AS (
          -- Same negative guard as the Spark side: printf('%019d', -42)
          -- renders '-000...42', whose lexicographic order is INVERTED
          -- among negatives ('-' sorts before digits), so an unguarded
          -- oracle would emit a silently wrong-but-confident min/max
          -- against Spark's loud raise_error. Failure must be symmetric.
          SELECT u.c, u.v FROM documents,
          LATERAL (VALUES
            ('doc_id', CASE WHEN doc_id < 0
               THEN error('q118: negative doc_id breaks lexicographic min/max')
               ELSE printf('%019d', doc_id) END),
            ('lang', lang),
            ('n_chars', CASE WHEN n_chars < 0
               THEN error('q118: negative n_chars breaks lexicographic min/max')
               ELSE printf('%019d', n_chars) END),
            ('source', source),
            ('text', text)) AS u(c, v)
        )
        SELECT c,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_null,
               COUNT(DISTINCT v) AS n_distinct,
               MIN(v) AS min_v,
               MAX(v) AS max_v
        FROM melted
        GROUP BY c
        ORDER BY c
      """.stripMargin.trim))
  )
}
