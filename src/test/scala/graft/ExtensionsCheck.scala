package graft

import org.apache.spark.sql.SparkSession

/** Standalone check (own JVM: `sbt "Test/runMain graft.ExtensionsCheck"`)
  * that GraftExtensions registers graft_dot through the public
  * SparkSessionExtensions path — no internal registry call anywhere. */
object ExtensionsCheck {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("sum(graft_dot(embedding, embedding)) AS s")
      .collect().head.getDouble(0)
    assert(d > 0, s"unexpected sum $d")
    val nSig = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("graft_minhash(array_distinct(split(text, ' ')), 8) AS sig")
      .selectExpr("count(distinct sig) AS n")
      .collect().head.getLong(0)
    assert(nSig > 1, s"graft_minhash produced $nSig distinct signatures")
    println(s"EXTENSIONS OK graft_dot sum=$d graft_minhash distinct=$nSig")
    spark.stop()
  }
}
