package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate embeddings (NaN/Inf elements, all-zero vectors, null vectors)
  * must never crash a query or silently corrupt a similarity ranking.
  *
  * Third axis of the input-robustness matrix (zero rows → null values →
  * non-finite values). The float `embedding` column is where non-finite
  * data silently CORRUPTS instead of crashing: Spark orders NaN above
  * every double and treats `NaN > t` as TRUE, so a NaN cosine tops every
  * descending rank and passes every near-dup threshold — a corrupt vector
  * becomes everyone's #1 neighbor. A zero vector reaches the same state
  * through plain arithmetic: cos = 0/0 = NaN with every element finite.
  * Ivf.search and SemanticDedup already defended this per-site (NaN→null
  * desc_nulls_last; nanvl→-1 before threshold); q44's raw `desc` window
  * and q43's `cos > 0.30` did not, which broke q71's declared
  * "must equal q44 bit-for-bit" contract on exactly the inputs where
  * ranking hygiene matters. First run against the ungated code: q43, q44,
  * q52 and q86 crashed outright (ANSI DIVIDE_BY_ZERO on the zero vector's
  * 0/0 cosine) and all three semantic pins below failed. The fix is one source-level corpus gate
  * (Tables.embeddingsClean — null/non-finite/zero-norm vectors excluded
  * at ingestion, like Tables.normalizeEventTs for timestamps): by
  * Cauchy–Schwarz, finite positive norms make every downstream cosine
  * finite in [-1,1], so no per-query sort or threshold needs patching.
  *
  * Fixture: sf0.001 with embeddings poisoned by vec_id mod 7 —
  * 0 → NaN element, 1 → +Infinity element, 2 → all-zero vector,
  * 3 → null vector, 4 → null ELEMENT (non-null array); 5–6 untouched.
  * Other tables copied as-is. The mod-4 row exists because the null-element
  * class is where the Spark and DuckDB gates can silently diverge: DuckDB's
  * list_sum SKIPS null elements (the norm probe alone passes
  * [3.0, NULL, 4.0]) while graft_vec_ok rejects them — oracleVecGate
  * carries a dedicated null-element conjunct to stay the same function
  * (r13 ADVICE).
  */
class DegenerateVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Every query that reads the embeddings table. */
  private val vectorQueries = Seq(
    "q43_cosine_neardup", "q44_knn_topk", "q45_multimodal_join",
    "q46_array_functions", "q52_embedding_lsh_ann", "q71_knn_operator",
    "q84_embedding_quantization", "q86_ivf_ann", "q94_semantic_dedup",
    "q100_label_centroids", "q126_centroid_distances", "q134_label_separability")

  private val poisonedMods = Seq(0L, 1L, 2L, 3L, 4L)

  private lazy val degDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-degvec-sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    tables.foreach { t =>
      spark.read.parquet(s"${TestSpark.sf0001}/$t.parquet")
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    val m = pmod(col("vec_id"), lit(7))
    spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .withColumn("embedding",
        when(m === 0, expr(
          "transform(embedding, (x, i) -> IF(i = 0, CAST('NaN' AS FLOAT), x))"))
        .when(m === 1, expr(
          "transform(embedding, (x, i) -> IF(i = 0, CAST('Infinity' AS FLOAT), x))"))
        .when(m === 2, expr("transform(embedding, x -> CAST(0.0 AS FLOAT))"))
        .when(m === 3, lit(null).cast("array<float>"))
        .when(m === 4, expr(
          "transform(embedding, (x, i) -> IF(i = 0, CAST(NULL AS FLOAT), x))"))
        .otherwise(col("embedding")))
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  vectorQueries.foreach { name =>
    test(s"$name executes over degenerate vectors") {
      // Full-column materialization (TestSpark.materialize scaladoc):
      // count() would let Catalyst prune the throwing column.
      TestSpark.materialize(Registry.queries(name)(spark, degDir))
    }
  }

  /** Sorted local snapshot for cell-for-cell comparison. */
  private def cells(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("q44 equals q71 cell-for-cell on the degenerate corpus") {
    val a = cells(Registry.queries("q44_knn_topk")(spark, degDir))
    val b = cells(Registry.queries("q71_knn_operator")(spark, degDir))
    assert(a.nonEmpty, "parity must be exercised on real rows")
    assert(a == b)
  }

  test("no degenerate vector surfaces in a similarity result") {
    def poisoned(df: DataFrame, idCols: Seq[String]): Long =
      idCols.map(c => df.filter(pmod(col(c), lit(7)).isin(poisonedMods: _*))
        .count()).sum
    assert(poisoned(Registry.queries("q44_knn_topk")(spark, degDir),
      Seq("q_id", "nb_id")) == 0)
    assert(poisoned(Registry.queries("q71_knn_operator")(spark, degDir),
      Seq("q_id", "nb_id")) == 0)
    assert(poisoned(Registry.queries("q43_cosine_neardup")(spark, degDir),
      Seq("va", "vb")) == 0)
    assert(poisoned(Registry.queries("q52_embedding_lsh_ann")(spark, degDir),
      Seq("q_id", "nb_id")) == 0)
    assert(poisoned(Registry.queries("q86_ivf_ann")(spark, degDir),
      Seq("q_id", "nb_id")) == 0)
  }

  test("every declared similarity in the degenerate run is finite") {
    Seq("q44_knn_topk" -> "cos_sim", "q43_cosine_neardup" -> "cos_sim",
        "q86_ivf_ann" -> "cos_sim").foreach { case (q, c) =>
      val df = Registry.queries(q)(spark, degDir)
      assert(df.filter(isnan(col(c)) || abs(col(c)) > 1.0000001).count() == 0,
        s"$q.$c must be finite and within [-1, 1]")
    }
  }

  test("the corpus gate is invisible on the clean fixture") {
    val raw = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet").count()
    val gated = sources.Tables.read(spark, TestSpark.sf0001, "embeddings").count()
    assert(raw == gated, "clean fixtures contain no degenerate vectors (verified " +
      "at all three scales) — the gate must drop nothing there")
  }
}
