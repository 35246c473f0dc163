package graft.functions

import org.apache.spark.sql.Column
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
}
