package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH banding for near-duplicate detection at scale
  * (SURVEY §2 I2, §7.5).
  *
  * The signature is built entirely from codegen'd built-ins: for seed i,
  * h_i(doc) = min over tokens of xxhash64(token, i). Banding groups rows of
  * the signature into `bands` buckets; two documents sharing any band hash
  * become a candidate pair. With sig length n = bands * rowsPerBand, the
  * probability a pair with Jaccard j becomes a candidate is
  * 1 - (1 - j^rowsPerBand)^bands — the standard S-curve. Candidates are then
  * confirmed with exact Jaccard, so false positives cost time, never
  * correctness; false negatives are bounded by the curve (recall asserted in
  * MinHashSpec).
  *
  * At 100 TB this is the path that replaces any quadratic similarity join:
  * cost is O(corpus) for signatures + O(candidates) for verification, with
  * shuffles keyed by band hash (uniform by construction).
  */
object MinHash {

  /** Column: MinHash signature (array<bigint>, length numHashes) from a
    * distinct-token array column. Pure built-ins → whole-stage codegen. */
  def signature(tokens: Column, numHashes: Int): Column = {
    val sigs = (0 until numHashes).map { i =>
      array_min(transform(tokens, t => xxhash64(t, lit(i))))
    }
    array(sigs: _*)
  }

  /** Explodes a signature into (bandId, bandHash) rows for LSH bucketing. */
  def bands(df: DataFrame, sigCol: String, numBands: Int): DataFrame = {
    val n = numBands
    df.withColumn("band_id", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("band_hash",
        xxhash64(col("band_id"),
          expr(s"slice($sigCol, band_id * (size($sigCol) div $n) + 1, size($sigCol) div $n)")))
  }

  /** Candidate near-dup pairs via LSH banding, confirmed by exact Jaccard.
    * Input: (idCol, tokens array). Output: d1, d2, jac (double) with
    * jac >= threshold. Exact-verify step makes precision 1.0; recall follows
    * the banding S-curve. */
  def nearDupPairs(docs: DataFrame, idCol: String, tokensCol: String,
      numHashes: Int, numBands: Int, threshold: Double): DataFrame = {
    val sig = docs.select(col(idCol).as("id"), col(tokensCol).as("toks"))
      .withColumn("sig", signature(col("toks"), numHashes))
    val banded = bands(sig, "sig", numBands).select("id", "band_hash")
    val cand = banded.as("x").join(banded.as("y"), Seq("band_hash"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"))
      .distinct()
    val t1 = sig.select(col("id").as("d1"), col("toks").as("t1"))
    val t2 = sig.select(col("id").as("d2"), col("toks").as("t2"))
    cand.join(t1, "d1").join(t2, "d2")
      .withColumn("jac",
        size(array_intersect(col("t1"), col("t2"))).cast("double") /
          size(array_union(col("t1"), col("t2"))))
      .filter(col("jac") >= threshold)
      .select("d1", "d2", "jac")
  }
}

/** D9/K2 exhibit: the same MinHash signature as a custom typed Aggregator
  * (UDAF), one pass, mergeable partials — the shape a TypedImperativeAggregate
  * would take if the built-in formulation ever became the bottleneck. */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Seq[String], Array[Long], Array[Long]] {

  private def h(token: String, seed: Int): Long = {
    // xxhash-like mix over the token bytes with the seed; stable and cheap.
    var x = seed.toLong * 0x9E3779B97F4A7C15L
    var i = 0
    while (i < token.length) {
      x = (x ^ token.charAt(i).toLong) * 0xC2B2AE3D27D4EB4FL
      x = java.lang.Long.rotateLeft(x, 31)
      i += 1
    }
    x
  }

  def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)
  def reduce(buf: Array[Long], tokens: Seq[String]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      var m = buf(i)
      tokens.foreach { t => val v = h(t, i); if (v < m) m = v }
      buf(i) = m
      i += 1
    }
    buf
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] = bufferEncoder
}
