package graft.queries

object TransformQueries extends QuerySection {
  def queries: Map[String, Catalog.Q] = Map()
  def oracleSql: Map[String, String] = Map()
}
