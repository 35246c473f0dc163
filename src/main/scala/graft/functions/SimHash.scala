package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprints (SURVEY §2 / LLM-pipeline dedup mandate).
  *
  * simhash(doc) = for each bit b, sign of Σ over tokens of (+1 if bit b of
  * xxhash64(token) set else -1), packed into a 64-bit word. Near-duplicate
  * documents (high token overlap) land within small Hamming distance.
  * Entirely built-ins (transform / aggregate / shiftleft), so the whole
  * computation stays in codegen and distributes trivially — one pass over
  * tokens per document, no shuffle.
  */
object SimHash {

  /** Column: 64-bit simhash from a token-array column. */
  def simhash64(tokens: Column): Column = {
    // For each of the 64 bit positions, count tokens with that bit set vs
    // total, then set the output bit when the balance is positive.
    val hashes = transform(tokens, t => xxhash64(t))
    val bitCols = (0 until 64).map { b =>
      val ones = aggregate(
        hashes, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)))
      when(ones * 2 > size(tokens), shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Bulk variant: (id, tokens) → (id, sim) via explode + one grouped pass.
    * Semantically identical to `simhash64` but keeps every expression inside
    * whole-stage codegen (the per-row 64×aggregate() tree above falls back
    * to interpreted evaluation and is ~10× slower in bulk). */
  def simhashAgg(df: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("__id"), explode(col(tokensCol)).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val sums = (0 until 64).map(b =>
      sum(expr(s"((__h >> $b) & 1) * 2 - 1")).as(s"__s$b"))
    val agged = tok.groupBy("__id").agg(sums.head, sums.tail: _*)
    val simCol = (0 until 64).map(b =>
        when(col(s"__s$b") > 0, expr(s"shiftleft(CAST(1 AS BIGINT), $b)"))
          .otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val fromTokens = agged.select(col("__id").as(idCol), simCol.as("sim"))
    // explode() emits no rows for empty/null token arrays, which would drop
    // those ids entirely; simhash64 fingerprints them as 0 — reattach them
    // so the bulk path keeps the documented equivalence.
    df.select(col(idCol)).distinct()
      .join(fromTokens, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("sim"), lit(0L)).as("sim"))
  }
}
