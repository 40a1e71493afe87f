package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.service.QueryService

/** Judged queries exercising the interactive service surface
  * (`src/api/main.py:154-221`) — the same engine paths a reference API
  * user hits, driven through [[graft.service.QueryService]] so the
  * endpoint semantics themselves are oracle-checked, not just the
  * underlying operators.
  */
object ServiceQueries extends QuerySection {
  import Catalog.Q

  /** GET /query/postgres semantics end-to-end: raw WHERE + limit. The
    * predicate selects a bounded deterministic set (50 keys) well under
    * the limit, so the page is the whole match and order-stable after
    * the explicit sort. */
  private def svcQuery(s: SparkSession, dir: String): DataFrame =
    new QueryService(s, dir)
      .query("customer", Some("c_custkey <= 50 AND c_acctbal >= 0"),
        limit = 100)
      .data
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_custkey"))

  /** Interactive SQL endpoint: the literal SQL text a user would POST,
    * planned by Catalyst over the registered lake views — judged with
    * the IDENTICAL text in DuckDB. */
  private val svcSqlText =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  private def svcSql(s: SparkSession, dir: String): DataFrame =
    new QueryService(s, dir).sql(svcSqlText).data

  def queries: Map[String, Q] = Map(
    "svc_query" -> (svcQuery _),
    "svc_sql" -> (svcSql _)
  )

  def oracleSql: Map[String, String] = Map(
    "svc_query" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  round(c_acctbal, 2) AS acctbal
        |FROM customer
        |WHERE c_custkey <= 50 AND c_acctbal >= 0
        |ORDER BY c_custkey""".stripMargin,
    "svc_sql" -> svcSqlText
  )
}
