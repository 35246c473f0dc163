package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY §7.5): when one join key carries a
  * disproportionate share of the fact rows, a plain shuffle join lands that
  * key on one task. Salting splits each fact key into `nSalts` shuffle
  * buckets and replicates the (small) dimension side across them — result
  * rows are identical to the unsalted join, but the heavy key's work spreads
  * over nSalts tasks. (AQE's skewedJoin handles sort-merge skew at runtime;
  * salting is the explicit, planner-independent form.) */
object Salting {

  /** Equi-join fact⋈dim on `key`, salted `nSalts` ways. The salt must be a
    * deterministic function of a fact column so re-execution is stable; a
    * per-row unique column (any id, any type) works — hash() accepts every
    * type and maps NULL to a stable non-null value, so no fact row can lose
    * its salt (pmod on a NULL source would drop the row from the join). */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: String, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(col(saltSource)), lit(nSalts)).cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
