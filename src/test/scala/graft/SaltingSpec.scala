package graft

import graft.functions.{Salting, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted equi-join returns exactly the plain join's rows under skew") {
    // 90% of fact rows share one hot key — the classic skew shape.
    val fact = graft.sources.Tables.events(spark, TestSpark.sf0001)
      .withColumn("k", when(col("user_id") < 13, 0L).otherwise(col("user_id")))
    val dim = Seq((0L, "hot"), (13L, "a"), (14L, "b")).toDF("k", "tag")
    val plain = fact.join(dim, Seq("k")).select("event_id", "tag")
    val salted = Salting.saltedEquiJoin(fact, dim, "k", "event_id", 8)
      .select("event_id", "tag")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("rolling fingerprints are content-determined and edit-sensitive") {
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "the quick brown fax")).toDF("id", "text")
    val fps = df.select($"id", TextFunctions.rollingHash($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L), "identical text, identical fingerprint")
    assert(fps(1L) != fps(3L), "one-char edit changes the fingerprint")
  }
}
