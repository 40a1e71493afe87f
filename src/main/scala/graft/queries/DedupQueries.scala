package graft.queries

object DedupQueries extends QuerySection {
  def queries: Map[String, Catalog.Q] = Map()
  def oracleSql: Map[String, String] = Map()
}
