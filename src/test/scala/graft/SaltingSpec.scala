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

  test("salted join keeps fact rows whose salt source is NULL") {
    val fact = Seq((0L, Some(1L)), (0L, None), (13L, Some(2L)))
      .toDF("k", "src")
    val dim = Seq((0L, "hot"), (13L, "a")).toDF("k", "tag")
    val plain = fact.join(dim, Seq("k")).select("src", "tag")
    val salted = Salting.saltedEquiJoin(fact, dim, "k", "src", 4)
      .select("src", "tag")
    assert(plain.count() == salted.count(),
      "a NULL salt source must not drop the row")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted join accepts a non-numeric salt source") {
    val fact = Seq((0L, "u-aa"), (0L, "u-bb"), (13L, "u-cc")).toDF("k", "src")
    val dim = Seq((0L, "hot"), (13L, "a")).toDF("k", "tag")
    val plain = fact.join(dim, Seq("k")).select("src", "tag")
    val salted = Salting.saltedEquiJoin(fact, dim, "k", "src", 4)
      .select("src", "tag")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("fingerprints of degenerate texts are NULL, not garbage") {
    val df = Seq((1L, ""), (2L, "short"), (3L, "long enough text here"))
      .toDF("id", "text")
    val rows = df.select($"id",
        TextFunctions.rollingHash($"text").as("fp"),
        TextFunctions.minShingleHash($"text", 8).as("msf"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(rows(1L) == (None, None), "empty text: both fingerprints NULL")
    assert(rows(2L)._1.isDefined && rows(2L)._2.isEmpty,
      "5-char text: whole-string fp defined, 8-shingle fp NULL")
    assert(rows(3L)._1.isDefined && rows(3L)._2.isDefined)
  }
}
