package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication — the SemDeDup-style scale path
  * for "these two documents say the same thing in different words": cluster
  * the corpus with the deterministic IVF k-means, then mark duplicates ONLY
  * within a cluster, so the pairwise cosine work is quadratic in the cluster
  * size, never in the corpus.
  *
  * Drop rule (leader dedup, deterministic): a vector is dropped iff some
  * LOWER-id vector in the same cluster has cosine similarity above the
  * threshold. The lowest id of every near-duplicate neighborhood therefore
  * always survives; chains (a~b, b~c, a!~c) keep their lowest member and
  * drop the rest, which slightly over-drops versus connected-component
  * collapse — the standard leader-clustering trade made for determinism and
  * one-pass execution.
  *
  * Scale notes: assignment is a broadcast-literal projection (no shuffle);
  * the pair join is an equi-join on cluster id — each cluster's pair set is
  * materialized only on its own shuffle partition. Cosine runs through the
  * codegen'd graft_dot. NaN cosines (zero-norm or non-finite vectors) are
  * coalesced to -1 BEFORE the threshold test: Spark SQL orders NaN above
  * every double, so a raw `cos > t` would call every degenerate pair a
  * duplicate.
  */
object SemanticDedup {

  /** (vec_id, e, nrm, c): the corpus with its cluster assignment —
    * MATERIALIZED once (lazy localCheckpoint, the q78 maskPairs pattern)
    * because the plan references it up to three times (both pair-join
    * sides + the summary counts), and the assignment projection walks the
    * nlist×dim centroid-score array per row; without the checkpoint each
    * reference would re-evaluate that dominant per-row cost. Lazy: eager
    * would run a job at DataFrame-construction time (schema inspections). */
  private def clustered(vecs: DataFrame,
      centroids: Array[Array[Double]]): DataFrame = {
    graft.plans.VectorFunctions.register(vecs.sparkSession)
    graft.SessionCache.lazyLocalCheckpoint("semdedup-clustered")(
      vecs.withColumn("c", Ivf.assignment(col("e"), centroids)))
  }

  /** Distinct (c, vec_id) rows for every DROPPED vector, from a
    * pre-clustered corpus (see clustered()). */
  private def droppedFrom(cl: DataFrame, threshold: Double): DataFrame = {
    val hi = cl.select(col("c"), col("vec_id").as("a_id"),
      col("e").as("ae"), col("nrm").as("anrm"))
    val lo = cl.select(col("c"), col("vec_id").as("b_id"),
      col("e").as("be"), col("nrm").as("bnrm"))
    hi.join(lo, Seq("c"))
      .filter(col("a_id") > col("b_id"))
      .withColumn("cos",
        nanvl(expr("graft_dot(ae, be) / (anrm * bnrm)"), lit(-1.0)))
      .filter(col("cos") > threshold)
      .select(col("c"), col("a_id").as("vec_id"))
      .distinct()
  }

  /** Distinct (cluster, vec_id) rows for every DROPPED vector.
    * vecs: (vec_id, e: array<double>, nrm) — the q86 corpus shape. */
  def dropped(vecs: DataFrame, centroids: Array[Array[Double]],
      threshold: Double): DataFrame =
    droppedFrom(clustered(vecs, centroids), threshold)

  /** Per-cluster summary: (cluster, n_vecs, n_dropped, n_kept). */
  def summary(vecs: DataFrame, centroids: Array[Array[Double]],
      threshold: Double): DataFrame = {
    val cl = clustered(vecs, centroids)
    val drops = droppedFrom(cl, threshold)
      .groupBy("c").agg(count(lit(1)).as("n_dropped"))
    cl.groupBy("c").agg(count(lit(1)).as("n_vecs"))
      .join(drops, Seq("c"), "left")
      .select(col("c").cast("long").as("cluster"),
        col("n_vecs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_vecs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
      .orderBy("cluster")
  }
}
