package graft

/** Dumps named queries' formatted physical plans to files — the per-round
  * optimization evidence (`plans/rNN/<query>_{before,after}.txt`). Run:
  * `sbt "Test/runMain graft.PlanDump plans/r20 after q86_ivf_ann ..."`
  * (args: outDir, suffix, query names). Uses sf0.1 (the bench scale) so
  * AQE/broadcast decisions match what the bench runs. Not part of the
  * test suite. */
object PlanDump {
  def main(a: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(a(0))
    val suffix = a(1)
    val names = a.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = TestSpark.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { n =>
      val plan = Registry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${outDir.resolve(s"${n}_$suffix.txt")}")
    }
  }
}
