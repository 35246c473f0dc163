package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Builder for the duplicate-key SKEW corpus — [[SkewInputSpec]]'s fixture,
  * extracted (r17) so the 9-mode parity matrix can run on the SAME corpus
  * from one committed entry point (`sbt "Test/runMain graft.SkewFixtureMain"`
  * → dir on stdout → `dev/parity.sh <dir>`), instead of the fixture living
  * only inside the spec's temp-dir lazy val. The r16 skew parity run —
  * which caught q30's pow2_line CAST_OVERFLOW — used exactly this corpus.
  *
  * Shapes (judge-specified, VERDICT r15 task 2): one order with ~10⁵
  * lineitems spanning every part; one user holding ~53% of events; one
  * text shared by ~10³ documents; one embedding shared by a third of the
  * vectors. Values stay ORGANIC — only the key distribution is
  * pathological (boundary magnitudes are [[StressFixture]]'s job).
  */
object SkewFixture {

  /** The mega-order key: the smallest organic l_orderkey (guaranteed to
    * exist in orders too, so the skew reaches the join, not a dangling
    * key the inner joins would just drop). */
  val MegaOrder = 0L

  /** The mega-user: an organic user_id (same reasoning). */
  val MegaUser = 0L

  /** Copies per distinct part in the mega-order: 200 parts × 500 = 10⁵. */
  val MegaCopies = 500L

  /** One fixed boilerplate sentence, long enough that every shingle /
    * token-window operator (5-gram shingles, BPE-ish token regex) gets
    * full windows, shared verbatim by all 1,000 clones. */
  val SharedText: String =
    "breaking update the replicated crawl snapshot repeats this exact " +
    "boilerplate navigation banner on every mirrored page of the archive " +
    "while the upstream index silently serves the same bytes again"

  /** Build the corpus under a fresh temp dir; returns the dir. */
  def build(spark: SparkSession): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-sf").toString
    val sf = TestSpark.sf0001

    Seq("region", "nation", "customer", "supplier", "part", "orders")
      .foreach { t =>
        spark.read.parquet(s"$sf/$t.parquet")
          .coalesce(1).write.parquet(s"$dir/$t.parquet")
      }

    // lineitem: organic 6,000 rows + the 100,000-row mega-order. One
    // source row per distinct part keeps every synthetic column (price,
    // dates, flags) organically distributed; l_linenumber is made unique
    // within the order (copy*1000 + partkey) purely for fixture hygiene.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val wPart = Window.partitionBy("l_partkey")
      .orderBy("l_orderkey", "l_linenumber")
    val perPart = li.withColumn("rn", row_number().over(wPart))
      .filter(col("rn") === 1).drop("rn")
    val mega = perPart
      .crossJoin(spark.range(MegaCopies).toDF("copy"))
      .withColumn("l_orderkey", lit(MegaOrder))
      .withColumn("l_linenumber",
        (col("copy") * 1000 + col("l_partkey")).cast("int"))
      .drop("copy")
    li.unionByName(mega.select(li.columns.map(col).toIndexedSeq: _*))
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")

    // events: every even event_id moves to the mega-user (~53% of the
    // corpus on one key); ts/value/props stay organic so only the key
    // distribution is pathological.
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(2)) === 0, lit(MegaUser))
          .otherwise(col("user_id")))
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    // documents: organic 500 rows + 1,000 shared-text clones with fresh
    // ids (500 + 4·doc_id + copy over even doc_ids → ids 500..2495,
    // collision-free). lang/source inherit from the cloned row, so the
    // clique spans languages and per-(lang,text) dedup still collapses
    // each lang's slice; n_chars re-derived to keep the fixture
    // internally consistent.
    val doc = spark.read.parquet(s"$sf/documents.parquet")
    val clones = doc.filter(pmod(col("doc_id"), lit(2)) === 0)
      .crossJoin(spark.range(4).toDF("copy"))
      .select(
        (lit(500L) + col("doc_id") * 4 + col("copy")).as("doc_id"),
        lit(SharedText).as("text"),
        col("lang"), col("source"),
        lit(SharedText.length.toLong).as("n_chars"))
    doc.unionByName(clones)
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // embeddings: every mod-3 vec_id gets vec 0's embedding verbatim
    // (broadcast single-row join — no literal array construction);
    // labels stay organic so identical points even straddle labels.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val shared = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("shared_vec"))
    emb.crossJoin(broadcast(shared))
      .withColumn("embedding",
        when(pmod(col("vec_id"), lit(3)) === 0, col("shared_vec"))
          .otherwise(col("embedding")))
      .drop("shared_vec")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }
}

/** Materialize the skew corpus for out-of-suite harnesses (the parity
  * matrix): prints the built dir as the last stdout line. */
object SkewFixtureMain {
  def main(args: Array[String]): Unit = {
    println("SKEW FIXTURE " + SkewFixture.build(TestSpark.spark))
  }
}
