package graft.operators

import graft.QueryDef
import graft.functions.{MinHash, SimHash}
import graft.multimodal.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch / approximate / UDF-surface operators (SURVEY §2 D3, I2, K1/K2)
  * plus the multimodal metadata pipeline.
  *
  * Queries whose results depend on engine-specific hash functions
  * (MinHash/LSH, SimHash, HLL, random-hyperplane LSH) are declared WITHOUT an
  * oracle — the driver records a rows-only check and the ScalaTest suites
  * assert their statistical contracts (recall vs the exact pair set, error
  * bounds vs exact distinct counts). Deterministic queries here (multimodal
  * metadata, the scalar-UDF exhibit) do carry oracles.
  */
object SketchQueries {

  private def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))

  lazy val defs: Seq[QueryDef] = Seq(
    // ---- D3: HyperLogLog approximate distinct (non-oracle; bound-tested) ----
    QueryDef(
      "q49_approx_distinct",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            approx_count_distinct(col("user_id")).as("approx_users"),
            approx_count_distinct(col("user_id"), 0.01).as("approx_users_1pct"),
            countDistinct(col("user_id")).as("exact_users"))
          .orderBy("event_type")),

    // ---- I2: MinHash/LSH near-dup candidates, exact-Jaccard confirmed
    // (non-oracle: xxhash64 seeds are Spark-specific; recall vs the exact
    // q33 pair set is asserted in MinHashSpec) ----
    QueryDef(
      "q50_minhash_lsh",
      (s, dir) =>
        MinHash.nearDupPairs(docToks(s, dir), "doc_id", "toks",
            numHashes = 64, numBands = 16, threshold = 0.8)
          .withColumn("jac", col("jac").cast("decimal(9,6)"))
          .orderBy("d1", "d2")),

    // ---- SimHash near-dup via banding (non-oracle; properties unit-tested).
    // Hamming ≤ 3 on 64-bit fingerprints ⇒ at least one of 4 16-bit chunks
    // identical (pigeonhole), so candidates come from chunk-equality joins —
    // never a full pair enumeration. ----
    QueryDef(
      "q51_simhash_neardup",
      (s, dir) => {
        val fp = docToks(s, dir)
          .withColumn("sim", SimHash.simhash64(col("toks")))
        val chunks = fp.withColumn("chunk_id", explode(sequence(lit(0), lit(3))))
          .withColumn("chunk",
            expr("(sim >> (chunk_id * 16)) & 65535"))
          .select("doc_id", "sim", "chunk_id", "chunk")
        val cand = chunks.as("x")
          .join(chunks.as("y"), Seq("chunk_id", "chunk"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            col("x.sim").as("s1"), col("y.sim").as("s2"))
          .distinct()
        cand.withColumn("hamming", SimHash.hamming(col("s1"), col("s2")))
          .filter(col("hamming") <= 3)
          .select("d1", "d2", "hamming")
          .orderBy("d1", "d2")
      }),

    // ---- I5 scale path: random-hyperplane LSH-bucketed ANN (non-oracle;
    // recall vs exact q44 asserted in VectorSpec) ----
    QueryDef(
      "q52_embedding_lsh_ann",
      (s, dir) => {
        val nPlanes = 8
        // Deterministic pseudo-random hyperplanes — stable across runs/nodes.
        val planes: Seq[Seq[Double]] = (0 until nPlanes).map { p =>
          (0 until 64).map { d =>
            val h = scala.util.hashing.MurmurHash3.productHash((p, d))
            (h % 1000) / 1000.0
          }
        }
        val v = Tables.read(s, dir, "embeddings")
          .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
          .withColumn("nrm",
            expr("sqrt(aggregate(transform(e, x -> x * x), CAST(0 AS DOUBLE), (s, x) -> s + x))"))
        val withPlanes = planes.zipWithIndex.foldLeft(v) { case (df, (plane, i)) =>
          df.withColumn(s"plane$i", typedLit(plane))
        }
        val sig = planes.indices.foldLeft(withPlanes) { case (df, i) =>
          df.withColumn(s"b$i",
            when(expr(s"aggregate(zip_with(e, plane$i, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x)") > 0,
              lit(1L)).otherwise(lit(0L)))
        }.withColumn("bucket",
            planes.indices.map(i => expr(s"b$i << $i")).reduce(_ bitwiseOR _))
          .select(col("vec_id"), col("e"), col("nrm"), col("bucket"))
        val q = sig.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("e").as("ae"),
            col("nrm").as("anrm"), col("bucket"))
        val c = sig.select(col("vec_id").as("nb_id"), col("e").as("be"),
          col("nrm").as("bnrm"), col("bucket"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("nb_id"))
        broadcast(q).join(c, Seq("bucket"))
          .filter(col("q_id") =!= col("nb_id"))
          .withColumn("cos",
            expr("aggregate(zip_with(ae, be, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x) / (anrm * bnrm)"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("nb_id"),
            col("cos").cast("decimal(18,9)").as("cos_sim"))
          .orderBy("q_id", "rank")
      }),

    // ---- Multimodal metadata pipeline (decode is a marked stub; the
    // byte-level metadata IS deterministic → oracled) ----
    QueryDef(
      "q53_multimodal_meta",
      (s, dir) =>
        Multimodal.decodeStub(Multimodal.withPayload(Tables.read(s, dir, "documents")))
          .select(col("doc_id"), col("n_bytes"), col("sha"),
            col("width"), col("height"), col("frames"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha,
               CAST(64 + CAST(octet_length(encode(text)) AS BIGINT) % 1856 AS INT) AS width,
               CAST(64 + (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 1016 AS INT) AS height,
               CAST(1 + CAST(octet_length(encode(text)) AS BIGINT) % 30 AS INT) AS frames
        FROM documents ORDER BY doc_id
      """.stripMargin.trim)),

    // ---- K1: scalar UDF exhibit with a mirrored SQL oracle ----
    QueryDef(
      "q54_udf_vowel_density",
      (s, dir) => {
        val vowels = udf((text: String) => text.count(c => "aeiou".indexOf(c) >= 0).toLong)
        Tables.read(s, dir, "documents")
          .withColumn("n_vowels", vowels(col("text")))
          .select(col("doc_id"), col("n_vowels"),
            (col("n_vowels").cast("double") / col("n_chars"))
              .cast("decimal(18,6)").as("vowel_density"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
               CAST(CAST(len(regexp_extract_all(text, '[aeiou]')) AS DOUBLE) / n_chars
                    AS DECIMAL(18,6)) AS vowel_density
        FROM documents ORDER BY doc_id
      """.stripMargin.trim))
  )
}
