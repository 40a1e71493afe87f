package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The judged query surface: every implemented operator from SURVEY.md §2
  * is represented by one deterministic, DuckDB-oracle-checkable query.
  *
  * Conventions (SURVEY.md §5 t2, §7.4):
  *  - every query ends in a total ORDER BY (or aggregates to few rows with
  *    a total ORDER BY) so the hash compare is order-stable;
  *  - double aggregates are rounded (2–4 dp) so Spark/DuckDB summation
  *    order differences in the last ulp can't flip the hash;
  *  - column names are aliased identically in the Spark plan and the SQL;
  *  - no wall-clock-dependent columns in compared output.
  */
object Catalog {
  type Q = (SparkSession, String) => DataFrame

  private val sections: Seq[QuerySection] = Seq(
    RelationalQueries,
    SourceQueries,
    TransformQueries,
    ValidationQueries,
    DedupQueries,
    CurationQueries,
    TextQueries,
    SimilarityQueries,
    MultimodalQueries,
    StreamingQueries,
    SinkQueries,
    ServiceQueries
  )

  def queries: Map[String, Q] = sections.map(_.queries).reduce(_ ++ _)
  def oracleSql: Map[String, String] = sections.map(_.oracleSql).reduce(_ ++ _)
}

/** One thematic group of judged queries. */
trait QuerySection {
  def queries: Map[String, Catalog.Q]
  def oracleSql: Map[String, String]
}
