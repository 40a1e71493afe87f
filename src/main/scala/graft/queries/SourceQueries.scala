package graft.queries

object SourceQueries extends QuerySection {
  def queries: Map[String, Catalog.Q] = Map()
  def oracleSql: Map[String, String] = Map()
}
