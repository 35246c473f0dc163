package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute end-to-end when nullable non-key
  * columns actually CONTAIN nulls.
  *
  * Every column in the fixture parquet is declared `optional`, so nulls
  * are schema-legal everywhere; at 100 TB they are also inevitable (a
  * scraper that lost a body, a source without embeddings, an event with
  * no payload). The sf0.001/0.01/0.1 fixtures happen to contain zero
  * actual nulls, so — like the zero-row surface (EmptyInputSpec) — no
  * other gate exercises the null paths of driver-collected state and
  * hand-written row loops. This sweep found four real crashes on first
  * run (BUILDLOG round 13): q54 and q73 (bare `String => Long` Scala
  * UDFs NPE on null input instead of following SQL's null-in/null-out),
  * q55 (MinHashAggregator.reduce NPE'd on a null token-set), and q71
  * (KnnJoinExec called toFloatArray on null embeddings on both the
  * collected query side and the streamed corpus side).
  *
  * Fixture: sf0.001 with every non-key column nulled where the table's
  * primary key ≡ 0 (mod 5) — deterministic, key-driven, join keys left
  * intact so the relational shape of the data survives.
  */
class NullInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Primary/foreign keys stay non-null — a null JOIN KEY just drops the
    * row under SQL semantics and would dilute the sweep's point, which is
    * null VALUES flowing through expressions, UDFs and custom operators. */
  private val keyCols = Set(
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "event_id", "user_id", "doc_id", "vec_id")

  private lazy val nullsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nulls-sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"${TestSpark.sf0001}/$t.parquet")
      val key = col(df.columns.head).cast("long")
      val out = df.columns.foldLeft(df) { (d, c) =>
        if (keyCols(c)) d
        else d.withColumn(c, when(pmod(key, lit(5)) === 0,
          lit(null).cast(d.schema(c).dataType)).otherwise(col(c)))
      }
      out.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes with nulls in non-key columns") {
      // Full-column materialization (TestSpark.materialize scaladoc):
      // count() would let Catalyst prune the throwing column.
      TestSpark.materialize(q.fn(spark, nullsDir))
    }
  }

  test("q54 follows null-in/null-out for null text") {
    val rows = Registry.queries("q54_udf_vowel_density")(spark, nullsDir)
      .filter(col("n_vowels").isNull).count()
    assert(rows > 0, "nulled documents must surface as null n_vowels, not crash or 0")
  }

  test("q71 knn skips null vectors on both sides") {
    val out = Registry.queries("q71_knn_operator")(spark, nullsDir)
    // Neighbor ids ≡ 0 (mod 5) have null embeddings in the fixture — a
    // null vector defines no cosine, so it must appear as NEITHER a query
    // (q_id) nor a neighbor (nb_id).
    assert(out.filter(pmod(col("q_id"), lit(5)) === 0).count() == 0)
    assert(out.filter(pmod(col("nb_id"), lit(5)) === 0).count() == 0)
    assert(out.count() > 0, "non-null vectors must still produce neighbors")
  }
}
