package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the dataloader-preparation batch (q106–q110) beyond the
  * DuckDB oracle: structural properties that must hold at ANY scale, plus
  * the plan shapes the 100 TB story depends on. */
class DataloaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) =
    Registry.queries(name)(spark, TestSpark.sf0001)

  private lazy val docTokens = Tables
    .read(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))

  test("q106: span accounting is internally consistent") {
    val rows = run("q106_duplicate_spans").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nPos, nDup, nSpans, maxSpan, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))
      assert(nDup <= nPos, s"dup positions cannot exceed positions: $r")
      assert((nSpans == 0) == (nDup == 0), s"spans iff dup positions: $r")
      // A span of L marked positions covers L+2 tokens; L <= nDup.
      assert(maxSpan == 0 || (maxSpan >= 3 && maxSpan <= nDup + 2),
        s"span length out of range: $r")
      // nSpans disjoint runs over nDup marked positions.
      assert(nSpans <= nDup, s"more spans than marked positions: $r")
      assert(ratio >= 0.0 && ratio <= 1.0, s"ratio out of [0,1]: $r")
    }
    // The synthetic corpus is ~60% near-duplicate: cross-doc duplicated
    // spans must actually exist, or the detector is dead.
    assert(rows.count(_.getLong(2) > 0) > rows.length / 2,
      "expected duplicated spans in the near-dup corpus")
  }

  test("q106: the island window partitions by doc_id, never globally") {
    val p = run("q106_duplicate_spans")
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(doc_id"),
      s"per-doc window must shuffle by doc_id:\n$p")
  }

  test("q107: every document lands in exactly one bucket that fits it") {
    val out = run("q107_length_buckets").collect()
    val nDocs = docTokens.count()
    assert(out.map(_.getLong(1)).sum == nDocs, "doc conservation")
    out.foreach { r =>
      val (bucket, n, toks, waste, util) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(5))
      assert(bucket > 0 && (bucket & (bucket - 1)) == 0,
        s"bucket must be a power of two: $r")
      assert(waste == bucket * n - toks, s"waste identity: $r")
      assert(util > 0.0 && util <= 1.0, s"utilization out of (0,1]: $r")
    }
    // Buckets are next-pow2: utilization can never drop to half or below
    // (a doc with n <= bucket/2 would have landed in the smaller bucket) —
    // except in the smallest bucket, which has no smaller neighbor.
    out.filter(_.getLong(0) > 16L).foreach { r =>
      assert(r.getDouble(5) > 0.5,
        s"next-pow2 bucketing guarantees >50% utilization: $r")
    }
  }

  test("q108: chunks tile each document with the declared stride") {
    val chunks = run("q108_rag_chunking")
    val byDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        min("start_tok").as("first_start"),
        max(col("start_tok") + col("chunk_tokens") - 1L).as("covered_to"),
        min("chunk_tokens").as("min_len"),
        max("chunk_tokens").as("max_len"))
      .join(docTokens, Seq("doc_id"))
      .collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      assert(r.getLong(2) == 1L, s"first chunk starts at token 1: $r")
      assert(r.getLong(3) == r.getLong(6), s"last chunk ends at n: $r")
      assert(r.getLong(4) >= 1L && r.getLong(5) <= 32L,
        s"chunk length within (0, W]: $r")
    }
    // Every doc produces ceil chunks for its length: total rows match the
    // closed-form count.
    // DIV, not `/`: Column `/` is double division (the q87 lesson).
    val expected = docTokens.select(
      sum(when(col("n") <= 32L, 1L)
        .otherwise(expr("1 + (n - 32 + 23) DIV 24"))).cast("long"))
      .head().getLong(0)
    assert(chunks.count() == expected, "closed-form chunk count")
  }

  test("q109: hash sampling is an aggregate, not a per-group window sort") {
    val df = run("q109_hash_sample")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk"),
      s"sampling must run as a partial/final aggregate:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      s"no window operator expected:\n$p")
    val rows = df.collect()
    val perLang = rows.groupBy(_.getString(0))
    perLang.foreach { case (lang, rs) =>
      assert(rs.length == 20, s"$lang: expected SampleK=20 samples")
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 20L),
        s"$lang: ranks must be 1..k")
      val ids = rs.map(_.getLong(2))
      assert(ids.distinct.length == ids.length, s"$lang: duplicate doc_id")
    }
    // Hash order must actually shuffle: the sample is not just the k
    // smallest doc_ids of the language.
    val docs = Tables.read(spark, TestSpark.sf0001, "documents")
      .select("lang", "doc_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    val allPrefix = perLang.forall { case (lang, rs) =>
      rs.map(_.getLong(2)).sorted.toSeq == docs(lang).take(20).toSeq
    }
    assert(!allPrefix, "hash sample must differ from the doc_id prefix")
  }

  test("q116: posting lists are k-bounded, tf-descending, and aggregate-built") {
    val df = run("q116_inverted_index")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk"),
      s"posting cap must be a partial/final aggregate:\n$p")
    assert(!p.contains("Window"), s"no per-token window sort expected:\n$p")
    val byTok = df.collect().groupBy(_.getString(0))
    assert(byTok.nonEmpty)
    byTok.foreach { case (tok, rows) =>
      assert(rows.length <= 5, s"$tok: posting list exceeds PostK")
      val ranks = rows.map(_.getLong(2)).sorted
      assert(ranks.sameElements(1L to rows.length), s"$tok: ranks not 1..n")
      val byRank = rows.sortBy(_.getLong(2))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          val (tfA, tfB) = (a.getLong(4), b.getLong(4))
          assert(tfA > tfB || (tfA == tfB && a.getLong(3) < b.getLong(3)),
            s"$tok: postings must rank by (tf desc, doc_id)")
        case _ =>
      }
      val df0 = rows.head.getLong(1)
      assert(df0 >= 25 && df0 <= 400, s"$tok: df outside the declared band")
    }
  }

  test("q118: profile metrics are consistent with the table") {
    val rows = run("q118_table_profile").collect()
    val nDocs = docTokens.count()
    assert(rows.length == 5, "one row per profiled column")
    rows.foreach { r =>
      assert(r.getLong(1) == nDocs, s"n_rows must equal the table size: $r")
      assert(r.getLong(2) == 0L, s"fixture has no nulls: $r")
      assert(r.getLong(3) <= r.getLong(1), s"distinct <= rows: $r")
      assert(r.getString(4) <= r.getString(5), s"min <= max: $r")
    }
    val byCol = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byCol("doc_id") == nDocs, "doc_id is unique")
  }

  test("q127: KL divergence is non-negative and types are bounded") {
    val rows = run("q127_source_divergence").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Gibbs' inequality: KL(p || q) >= 0, with slack for the per-term
      // DECIMAL(28,18) rounding (n_types terms, half-ulp each) plus the
      // DECIMAL(38,6) output rounding.
      assert(r.getDouble(2) >= -(r.getLong(1) * 5e-19 + 5e-7),
        s"KL must be non-negative: $r")
      assert(r.getLong(1) >= 1L, s"every source has types: $r")
    }
    // A source identical to the corpus mix would have KL 0; the synthetic
    // sources differ, so at least one must be strictly positive.
    assert(rows.exists(_.getDouble(2) > 1e-6), "divergence detector is alive")
  }

  test("q110: vocabulary accounting per source") {
    val rows = run("q110_vocab_growth").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (toks, types, hapax, ttr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(hapax <= types, s"hapax are types: $r")
      assert(types <= toks, s"types cannot exceed tokens: $r")
      assert(ttr > 0.0 && ttr <= 1.0, s"TTR out of (0,1]: $r")
    }
    // Cross-check the corpus token total against a direct count.
    val total = docTokens.select(sum("n")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == total, "token conservation")
  }
}
