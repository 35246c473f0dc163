package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text fingerprinting built from codegen-safe column expressions
  * (LLM-pipeline mandate: document fingerprinting via rolling hash).
  *
  * Built with the Column-based higher-order-function API (not expr() string
  * splicing, which breaks on column names that need backticks and on
  * composite Column expressions whose toString does not re-parse). */
object TextFunctions {

  /** Modulus keeps the fold inside BIGINT under ANSI mode (Spark 4 default)
    * and matches the DuckDB oracle's arithmetic exactly. */
  val FpMod = 1000000007L

  private def code(text: Column, i: Column): Column =
    ascii(text.substr(i, lit(1))).cast("long")

  private def fold(codes: Column): Column =
    aggregate(codes, lit(0L), (acc, c) => (acc * 31 + c) % FpMod)

  /** Polynomial rolling hash of the whole string:
    * fold (acc * 31 + charCode) % FpMod over the characters.
    * f(0, c) = c, so Spark's zero-seeded aggregate equals DuckDB's
    * first-element-seeded list_reduce. NULL for the empty string (Spark's
    * sequence(1, 0) would descend to [1, 0], not an empty range — folding
    * it would hash garbage; the oracle's list_reduce errors instead). */
  def rollingHash(text: Column): Column =
    when(length(text) === 0, lit(null).cast("long"))
      .otherwise(fold(transform(sequence(lit(1), length(text)), i => code(text, i))))

  /** Minimum rolling hash over all w-length character shingles — the
    * winnowing-style compact fingerprint: near-identical texts (small edits)
    * keep the same minimum with high probability. NULL when the text is
    * shorter than one shingle (same descending-sequence hazard as above;
    * DuckDB's empty generate_series gives list_min(NULL-ish) = NULL). */
  def minShingleHash(text: Column, w: Int): Column =
    when(length(text) < w, lit(null).cast("long"))
      .otherwise(array_min(transform(
        sequence(lit(1), length(text) - (w - 1)),
        i => fold(transform(sequence(i, i + (w - 1)), j => code(text, j))))))
}
