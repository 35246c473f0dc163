package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator exhibit: a Spark query over the test tables plus,
  * when the semantics are SQL-expressible, a DuckDB oracle that must produce
  * the byte-identical result (same column names, same row order — see
  * SURVEY.md §7.4 determinism rules).
  *
  * Queries without an oracle (streaming, sketches, hash-seeded ops) still
  * ship as `queries` entries; the driver records a rows-only check and the
  * ScalaTest suites carry the correctness burden.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  def all: Seq[QueryDef] =
    operators.RelationalQueries.defs ++
      operators.WindowQueries.defs ++
      operators.EventQueries.defs ++
      operators.TextQueries.defs ++
      operators.VectorQueries.defs ++
      operators.ServingQueries.defs ++
      operators.SketchQueries.defs ++
      operators.AnalyticsQueries.defs ++
      operators.SketchJoinQueries.defs ++
      operators.CurationQueries.defs ++
      operators.PretrainQueries.defs ++
      operators.DataloaderQueries.defs ++
      operators.RetentionQueries.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
