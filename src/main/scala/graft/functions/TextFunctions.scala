package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text fingerprinting built from codegen-safe column expressions
  * (LLM-pipeline mandate: document fingerprinting via rolling hash). */
object TextFunctions {

  /** Modulus keeps the fold inside BIGINT under ANSI mode (Spark 4 default)
    * and matches the DuckDB oracle's arithmetic exactly. */
  val FpMod = 1000000007L

  /** Polynomial rolling hash of the whole string:
    * fold (acc * 31 + charCode) % FpMod over the characters.
    * f(0, c) = c, so Spark's zero-seeded aggregate equals DuckDB's
    * first-element-seeded list_reduce. */
  def rollingHash(text: Column): Column =
    expr(s"aggregate(transform(sequence(1, length(${text.toString})), " +
      s"i -> CAST(ascii(substring(${text.toString}, i, 1)) AS BIGINT)), " +
      s"CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % $FpMod)")

  /** Minimum rolling hash over all w-length character shingles — the
    * winnowing-style compact fingerprint: near-identical texts (small edits)
    * keep the same minimum with high probability. */
  def minShingleHash(text: Column, w: Int): Column =
    expr(s"array_min(transform(sequence(1, length(${text.toString}) - ${w - 1}), " +
      s"i -> aggregate(transform(sequence(i, i + ${w - 1}), " +
      s"j -> CAST(ascii(substring(${text.toString}, j, 1)) AS BIGINT)), " +
      s"CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % $FpMod)))")
}
