package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute end-to-end over ZERO-ROW inputs.
  *
  * An empty slice is not an exotic input at 100 TB — a date-partitioned
  * corpus routinely hands a pipeline an empty partition (a quiet hour, a
  * new source, a filter that matched nothing upstream), and "crashes on
  * the empty day" is a classic production pager. Catalyst makes this a
  * distinct surface from the sf0.001 smoke: plans are ANALYZED before any
  * row count is known, so driver-side state built FROM data (IVF
  * centroids, bloom filters, collected vocab) can produce unresolvable
  * expressions or null buffers that no non-empty fixture ever exercises.
  * This sweep found three real crashes on first run (BUILDLOG round 13):
  * q86/q94 (empty k-means centroid set -> NullType `array()` fails
  * analysis inside array_position) and q72 (Spark's own
  * `stat.bloomFilter` NPEs on a zero-row build side).
  *
  * The fixture is the sf0.001 schema with zero rows — written through the
  * same Spark parquet sink the engine reads, once per JVM. No assertion
  * on row COUNTS beyond non-negativity: global aggregates legitimately
  * return one row over empty input (count=0, sum=null), grouped ones
  * return none; both are correct shapes for downstream consumers.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      // limit(0) preserves the parquet logical types (decimal, timestamp,
      // array) exactly; coalesce(1) guarantees a footer for the readers
      // that probe one (Tables.eventsRaw's nanos shim).
      spark.read.parquet(s"${TestSpark.sf0001}/$t.parquet").limit(0)
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes on zero-row inputs") {
      // Full-column materialization (TestSpark.materialize scaladoc):
      // count() would let Catalyst prune the throwing column.
      TestSpark.materialize(q.fn(spark, emptyDir))
    }
  }
}
