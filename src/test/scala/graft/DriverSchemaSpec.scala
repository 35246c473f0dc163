package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-compatibility invariant (learned in round 1, VERDICT.md):
  * the driver hash-compares the Spark parquet (read via pandas) against the
  * DuckDB oracle (read via .df()). Two output shapes break that compare even
  * when values are identical:
  *   - DecimalType columns: pandas loads them as python Decimal objects
  *     while the oracle side arrives as float64 → hash mismatch.
  *   - ArrayType/MapType/StructType columns: numpy.ndarray / dict cells are
  *     unhashable and crash the checker's sort_values.
  * So no declared query may emit any of those in its FINAL schema. Decimal
  * arithmetic stays internal (exactness/order-independence) — only the final
  * projection must cast to double (Q.out2/out6/outD).
  */
class DriverSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def banned(dt: DataType): Boolean = dt match {
    case _: DecimalType | _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  Registry.all.foreach { q =>
    test(s"${q.name} final schema is driver-hashable (no decimal/array/map/struct)") {
      val schema = q.fn(spark, TestSpark.sf0001).schema
      val bad = schema.fields.filter(f => banned(f.dataType))
      assert(bad.isEmpty,
        s"driver-incompatible output columns: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    }
  }
}
