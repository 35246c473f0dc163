// COMBINED skew x boundary stress fixture (dev-only, not compiled by sbt).
// The r16 depth sweep: the five robustness axes each poison ONE property;
// this fixture composes the two structural ones — the skew shapes
// (mega-order over all parts, mega-user, 1000-clone text clique,
// shared/zero vectors) CARRYING boundary magnitudes (9.9e13 prices,
// zero/one discounts, empty props, boundary texts). Build + sweep:
//
//   /opt/spark/bin/spark-shell --master 'local[8]' \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC -i dev/stress_fixture.scala
//   SPARK_GRAFT_CPUS=8 dev/run.sh graft.Verify /tmp/graft_combined_stress \
//     /tmp/verify_combined 2>&1 >/dev/null | grep '\[verify\].*failed'
//
// Expected failures at r16 HEAD, all adjudicated (BUILDLOG round 16 #9):
//   q129  CAST_OVERFLOW at the one BIGINT OUTPUT cast (class A truly
//         exceeds Long.Max on this corpus; internals exact in decimal)
//   q33/q78/q133  the DESIGNED <=64-word bitmask-vocabulary guard
//         (loud, points at the q50 MinHash/LSH scale path)
// Anything else failing = a NEW domain-vs-fixture bug; fix at the cause.
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

val sf = "/root/testdata/sf0.001"
val dir = "/tmp/graft_combined_stress"

Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
  spark.read.parquet(s"$sf/$t.parquet").coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
}

val li0 = spark.read.parquet(s"$sf/lineitem.parquet")
val wPart = Window.partitionBy("l_partkey").orderBy("l_orderkey", "l_linenumber")
val perPart = li0.withColumn("rn", row_number().over(wPart)).filter(col("rn") === 1).drop("rn")
val mega = perPart.crossJoin(spark.range(500L).toDF("copy"))
  .withColumn("l_orderkey", lit(0L))
  .withColumn("l_linenumber", (col("copy") * 1000 + col("l_partkey")).cast("int"))
  .drop("copy")
val li = li0.unionByName(mega.select(li0.columns.map(col).toIndexedSeq: _*))
val ml = pmod(col("l_linenumber").cast("long") + col("l_partkey"), lit(17))
li.withColumn("l_extendedprice",
    when(ml === 2, lit(9.9e13)).when(ml === 3, lit(-999.99)).otherwise(col("l_extendedprice")))
  .withColumn("l_quantity", when(ml === 4, lit(0.0)).otherwise(col("l_quantity")))
  .withColumn("l_discount",
    when(ml === 5, lit(1.0)).when(ml === 6, lit(0.0)).otherwise(col("l_discount")))
  .withColumn("l_tax", when(ml === 6, lit(0.0)).otherwise(col("l_tax")))
  .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

val ord = spark.read.parquet(s"$sf/orders.parquet")
val mo = pmod(col("o_orderkey"), lit(17))
ord.withColumn("o_totalprice",
    when(mo === 2, lit(-1.0)).when(mo === 3, lit(9.9e12)).otherwise(col("o_totalprice")))
  .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

val ev = spark.read.parquet(s"$sf/events.parquet")
val me = pmod(col("event_id"), lit(6))
ev.withColumn("user_id",
    when(pmod(col("event_id"), lit(2)) === 0, lit(0L)).otherwise(col("user_id")))
  .withColumn("value",
    when(me === 2, lit(9.9e12)).when(me === 3, lit(-12345.6789))
    .when(me === 4, lit(0.0)).otherwise(col("value")))
  .withColumn("props", when(me === 5, lit("")).otherwise(col("props")))
  .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

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
    .when(md === 6, lit("\u0130stanbul \u0131\u015f\u0131k \u00c5\u00c4\u00d6 \u00df \u6f22\u5b57\u30c6\u30b9\u30c8 \ud83d\ude80 caf\u00e9"))
    .otherwise(col("text")))
  .withColumn("n_chars",
    when(md.isin(0L, 1L, 2L, 3L, 4L, 5L, 6L), length(col("text")).cast("long"))
      .otherwise(col("n_chars")))
val clones = doc0.filter(pmod(col("doc_id"), lit(2)) === 0)
  .crossJoin(spark.range(4).toDF("copy"))
  .select((lit(500L) + col("doc_id") * 4 + col("copy")).as("doc_id"),
    lit(SharedText).as("text"), col("lang"), col("source"),
    lit(SharedText.length.toLong).as("n_chars"))
doc.unionByName(clones).coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

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

println("COMBINED FIXTURE DONE " + dir)
sys.exit(0)
