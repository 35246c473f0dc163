package graft

import graft.functions.MinHash
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for q50 at sf0.1 — run with
  * `sbt "Test/runMain graft.ProfileQ50"`. Not part of the test suite. */
object ProfileQ50 {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q50] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    // warm
    docs.count()
    val grouped = MinHash.distinctSets(docs, "doc_id", "toks")
    time("distinctSets count")(grouped.count())
    val sets = grouped.select(col("rep"), col("toks"))
    val sig = sets.withColumn("sig", MinHash.signature(col("toks"), 96))
    // toRdd.count(): a plain Dataset.count() lets the optimizer PRUNE the
    // signature projection (nothing downstream consumes it in a count), so
    // the stage being timed would never run — the ScaleCheck lesson.
    time("signatures")(sig.queryExecution.toRdd.count())
    val banded = MinHash.bands(sig, "sig", 16).select("rep", "band_hash")
    time("banding")(banded.count())
    val cand = banded.as("x").join(banded.as("y"), Seq("band_hash"))
      .filter(col("x.rep") < col("y.rep"))
      .select(col("x.rep").as("r1"), col("y.rep").as("r2"))
      .distinct()
    time("candidates")(cand.count())
    val full = MinHash.nearDupPairs(docs, "doc_id", "toks", 96, 16, 0.8)
    time("full pipeline count")(full.count())
    time("full + orderBy (declared)")(full.orderBy("d1", "d2").count())
    // No spark.stop(): TestSpark.spark is suite-shared; Test/runMain forks,
    // so JVM exit cleans up (see ProfileQ130 for the rationale).
  }
}
