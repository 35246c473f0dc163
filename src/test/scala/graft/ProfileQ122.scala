package graft

import org.apache.spark.sql.functions._

/** Ad-hoc measurement of the PPJoin positional min-overlap refinement on
  * q122 at sf0.1 — run with `sbt "Test/runMain graft.ProfileQ122"`. Not
  * part of the test suite.
  *
  * Rebuilds the candidate stage inline twice — prefix+size filter only
  * (the round-5 shape) vs prefix+size+positional bound (round-6) — and
  * counts surviving candidate pairs for each, then times the declared
  * query end-to-end on a fresh session (cold SessionCache key). Stage
  * timings use `toRdd.count()` so the optimizer cannot prune the stage
  * being timed (the ProfileQ50 lesson, BASELINE round-5).
  */
object ProfileQ122 {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q122] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.sources.Tables.read(spark, dir, "documents")
    docs.count() // warm scan

    val sets = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        """sort_array(array_distinct(transform(sequence(1, size(toks) - 2),
           i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
                          element_at(toks, i + 2)))))""").as("shs"))
      .groupBy("shs").agg(min(col("doc_id")).as("sid"))
      .withColumn("sz", size(col("shs")).cast("long"))
      .localCheckpoint()
    val df = sets.select(explode(col("shs")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("n_sets"))
    val ordered = sets.select(col("sid"), explode(col("shs")).as("sh"))
      .join(df, "sh")
      .groupBy("sid")
      .agg(expr("transform(sort_array(collect_list(struct(n_sets, sh))), x -> x.sh)")
        .as("oshs"))
    val prefixes = ordered.join(sets.select("sid", "sz"), "sid")
      .withColumn("p", col("sz") - expr("(4 * sz + 4) DIV 5") + 1L)
      .select(col("sid"), col("sz"),
        posexplode(expr("slice(oshs, 1, CAST(p AS INT))")).as(Seq("pos", "sh")))
      .localCheckpoint()
    println(s"[q122] sets=${sets.count()} prefix_rows=${prefixes.count()}")

    val base = prefixes.as("a")
      .join(prefixes.as("b"), col("a.sh") === col("b.sh") &&
        col("a.sid") < col("b.sid") &&
        col("a.sz") * 5L >= col("b.sz") * 4L &&
        col("b.sz") * 5L >= col("a.sz") * 4L)
      .select(col("a.sid").as("sid_a"), col("b.sid").as("sid_b"))
    val pos = prefixes.as("a")
      .join(prefixes.as("b"), col("a.sh") === col("b.sh") &&
        col("a.sid") < col("b.sid") &&
        col("a.sz") * 5L >= col("b.sz") * 4L &&
        col("b.sz") * 5L >= col("a.sz") * 4L &&
        expr("1 + least(a.sz - a.pos - 1, b.sz - b.pos - 1) >= " +
          "((a.sz + b.sz) * 4) DIV 9 + 1"))
      .select(col("a.sid").as("sid_a"), col("b.sid").as("sid_b"))

    val nBaseRows = time("candidate rows, size-only")(base.count())
    val nPosRows = time("candidate rows, +positional")(pos.count())
    val nBase = time("distinct candidates, size-only")(base.distinct().count())
    val nPos = time("distinct candidates, +positional")(pos.distinct().count())
    println(s"[q122] rows: $nBaseRows -> $nPosRows   " +
      s"pairs: $nBase -> $nPos")

    time("declared q122 end-to-end (fresh session)") {
      Registry.queries("q122_prefix_jaccard_join")(spark.newSession(), dir).count()
    }
    // No spark.stop(): TestSpark.spark is suite-shared; Test/runMain forks.
  }
}
