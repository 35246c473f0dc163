package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Builder for the COMBINED skew × boundary stress corpus — the r16 depth
  * sweep's fixture, promoted from `dev/stress_fixture.scala` (a spark-shell
  * script with a hand-run command, which rots) into the suite so
  * [[StressSweepSpec]] can pin the sweep's expected-failure set (VERDICT
  * r16 "next round" task 3).
  *
  * The five robustness axes each poison ONE property; this corpus composes
  * the two structural ones — the skew shapes (mega-order over all parts,
  * mega-user, 1000-clone text clique, shared/zero vectors) CARRYING
  * boundary magnitudes (9.9e13 prices, zero/one discounts, empty props,
  * boundary texts). It found q129's internal-accumulator overflow where
  * the single axes didn't (BUILDLOG round 16 #9).
  */
object StressFixture {

  /** Build the corpus under a fresh temp dir; returns the dir. */
  def build(spark: SparkSession): String = {
    val sf = TestSpark.sf0001
    val dir = java.nio.file.Files
      .createTempDirectory("graft-combined-stress").toString

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }

    // lineitem: the 10^5-row mega-order (SkewInputSpec's shape) whose rows
    // then take boundary magnitudes on a mod-17 lattice — DECIMAL(18,4)
    // price edge, negative corrections, zero quantity, zero/full discount.
    val li0 = spark.read.parquet(s"$sf/lineitem.parquet")
    val wPart = Window.partitionBy("l_partkey").orderBy("l_orderkey", "l_linenumber")
    val perPart = li0.withColumn("rn", row_number().over(wPart))
      .filter(col("rn") === 1).drop("rn")
    val mega = perPart.crossJoin(spark.range(500L).toDF("copy"))
      .withColumn("l_orderkey", lit(0L))
      .withColumn("l_linenumber", (col("copy") * 1000 + col("l_partkey")).cast("int"))
      .drop("copy")
    val li = li0.unionByName(mega.select(li0.columns.map(col).toIndexedSeq: _*))
    val ml = pmod(col("l_linenumber").cast("long") + col("l_partkey"), lit(17))
    li.withColumn("l_extendedprice",
        when(ml === 2, lit(9.9e13)).when(ml === 3, lit(-999.99))
          .otherwise(col("l_extendedprice")))
      .withColumn("l_quantity", when(ml === 4, lit(0.0)).otherwise(col("l_quantity")))
      .withColumn("l_discount",
        when(ml === 5, lit(1.0)).when(ml === 6, lit(0.0)).otherwise(col("l_discount")))
      .withColumn("l_tax", when(ml === 6, lit(0.0)).otherwise(col("l_tax")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val mo = pmod(col("o_orderkey"), lit(17))
    ord.withColumn("o_totalprice",
        when(mo === 2, lit(-1.0)).when(mo === 3, lit(9.9e12))
          .otherwise(col("o_totalprice")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // events: mega-user (~half the corpus on one key) + boundary values
    // and empty props on a mod-6 lattice.
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val me = pmod(col("event_id"), lit(6))
    ev.withColumn("user_id",
        when(pmod(col("event_id"), lit(2)) === 0, lit(0L)).otherwise(col("user_id")))
      .withColumn("value",
        when(me === 2, lit(9.9e12)).when(me === 3, lit(-12345.6789))
          .when(me === 4, lit(0.0)).otherwise(col("value")))
      .withColumn("props", when(me === 5, lit("")).otherwise(col("props")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    // documents: boundary texts on a mod-11 lattice + the 1000-clone
    // shared-text clique (the one-band-bucket worst case).
    val SharedText = "breaking update the replicated crawl snapshot repeats this exact " +
      "boilerplate navigation banner on every mirrored page of the archive " +
      "while the upstream index silently serves the same bytes again"
    val doc0 = spark.read.parquet(s"$sf/documents.parquet")
    val md = pmod(col("doc_id"), lit(11))
    val doc = doc0.withColumn("text",
        when(md === 0, lit(""))
          .when(md === 1, lit("x"))
          .when(md === 2, lit("   "))
          .when(md === 3, expr("repeat('a', 4000)"))
          .when(md === 4, expr("trim(repeat('tok ', 300))"))
          .when(md === 5, lit("\n\t\r"))
          .when(md === 6, lit("İstanbul ışık ÅÄÖ ß 漢字テスト 🚀 café"))
          .otherwise(col("text")))
      .withColumn("n_chars",
        when(md.isin(0L, 1L, 2L, 3L, 4L, 5L, 6L), length(col("text")).cast("long"))
          .otherwise(col("n_chars")))
    val clones = doc0.filter(pmod(col("doc_id"), lit(2)) === 0)
      .crossJoin(spark.range(4).toDF("copy"))
      .select((lit(500L) + col("doc_id") * 4 + col("copy")).as("doc_id"),
        lit(SharedText).as("text"), col("lang"), col("source"),
        lit(SharedText.length.toLong).as("n_chars"))
    doc.unionByName(clones)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // embeddings: shared vector (a third of the corpus on one point) +
    // all-zero vectors on a mod-15 lattice.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val shared = emb.filter(col("vec_id") === 0).select(col("embedding").as("shared_vec"))
    emb.crossJoin(broadcast(shared))
      .withColumn("embedding",
        when(pmod(col("vec_id"), lit(15)) === 1,
          expr("transform(embedding, x -> CAST(0.0 AS FLOAT))"))
          .when(pmod(col("vec_id"), lit(3)) === 0, col("shared_vec"))
          .otherwise(col("embedding")))
      .drop("shared_vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    dir
  }
}
