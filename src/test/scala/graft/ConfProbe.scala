package graft

/** One-command conf-landing probe for parity-mode flags — the permanent
  * successor to the throwaway probes rounds 13's parity work used to
  * verify that `-Dspark.*` system properties actually reach the session
  * (BUILDLOG round 13: a flag that silently fails to land turns a parity
  * certification into a vacuous pass, exactly like the `LANG=tr_TR` env
  * route that never displaced the JVM locale).
  *
  *   JAVA_TOOL_OPTIONS="-Dspark.sql.parquet.filterPushdown=false" \
  *     sbt "Test/runMain graft.ConfProbe spark.sql.parquet.filterPushdown"
  *
  * Prints, for each named key: the JVM system-property value (what the
  * injection route delivered) and the resolved session conf value (what
  * Spark will actually consult). A parity mode is proven to land when the
  * session value matches the injected one AND the no-flag baseline prints
  * a different (default) value — run the probe once with and once without
  * the flags. With no args, probes the keys used by dev/parity.sh modes.
  * Not part of the test suite.
  */
object ConfProbe {
  private val parityKeys = Seq(
    "spark.sql.codegen.wholeStage",
    "spark.sql.codegen.factoryMode",
    "spark.sql.adaptive.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.parquet.enableVectorizedReader",
    "spark.sql.execution.useObjectHashAggregateExec",
    "spark.serializer",
    "spark.sql.ansi.enabled",
    "spark.memory.offHeap.enabled",
    "spark.memory.offHeap.size",
    "spark.sql.columnVector.offheap.enabled",
    "spark.sql.parquet.filterPushdown")

  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args.toSeq else parityKeys
    val spark = TestSpark.spark
    println("key | -D sysprop | session conf")
    keys.foreach { k =>
      val prop = sys.props.get(k).getOrElse("<unset>")
      val conf = try spark.conf.get(k) catch { case _: Exception => "<no-default>" }
      println(s"[probe] $k | $prop | $conf")
    }
    println(s"[probe] default zone: ${java.util.TimeZone.getDefault.getID}, " +
      s"locale: ${java.util.Locale.getDefault}, " +
      s"charset: ${java.nio.charset.Charset.defaultCharset}")
  }
}
