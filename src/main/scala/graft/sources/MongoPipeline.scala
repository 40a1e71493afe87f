package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-store aggregation-pipeline compiler (SURVEY.md §2.5 A8).
  *
  * The reference forwards `pipeline: List[Dict]` verbatim to MongoDB
  * (`mongo_connector.py:225-240`) — the database is the executor. Here
  * the engine IS the executor: each stage compiles to the corresponding
  * Catalyst operator ($match→filter, $group→agg, $sort→orderBy,
  * $limit→limit, $project→select, $unwind→explode), so the pipeline
  * optimizes and distributes like any other plan (match pushdown,
  * partial aggregation — for free).
  */
object MongoPipeline {

  sealed trait Stage

  /** `$match` — equality map or arbitrary predicate. */
  final case class Match(cond: Column) extends Stage
  object Match {
    def eq(filters: (String, Any)*): Match =
      Match(filters.map { case (k, v) => col(k) === lit(v) }.reduce(_ && _))
  }

  /** `$group` — `_id` keys + accumulators `(alias, op, field)` with ops
    * sum|avg|min|max|count|first|push. */
  final case class Group(keys: Seq[String],
    accumulators: Seq[(String, String, String)]) extends Stage

  /** `$sort` — (field, ascending). */
  final case class Sort(fields: Seq[(String, Boolean)]) extends Stage

  final case class Limit(n: Int) extends Stage
  final case class Skip(n: Int) extends Stage

  /** `$project` — keep the named fields. */
  final case class Project(fields: Seq[String]) extends Stage

  /** `$unwind` — explode an array field into one row per element. */
  final case class Unwind(field: String) extends Stage

  def compile(df: DataFrame, stages: Seq[Stage]): DataFrame =
    stages.foldLeft(df) {
      case (d, Match(cond)) => d.filter(cond)
      case (d, Group(keys, accs)) =>
        val aggs = accs.map {
          case (alias, "sum", f)   => sum(col(f)).as(alias)
          case (alias, "avg", f)   => avg(col(f)).as(alias)
          case (alias, "min", f)   => min(col(f)).as(alias)
          case (alias, "max", f)   => max(col(f)).as(alias)
          case (alias, "count", _) => count(lit(1)).as(alias)
          case (alias, "first", f) => first(col(f)).as(alias)
          case (alias, "push", f)  => collect_list(col(f)).as(alias)
          case (_, op, _) => throw new IllegalArgumentException(
            s"unsupported accumulator: $op")
        }
        d.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      case (d, Sort(fields)) =>
        d.orderBy(fields.map { case (f, asc) =>
          if (asc) col(f).asc else col(f).desc }: _*)
      case (d, Limit(n)) => d.limit(n)
      case (d, Skip(n)) => d.offset(n)
      case (d, Project(fields)) => d.select(fields.map(col): _*)
      case (d, Unwind(f)) => d.withColumn(f, explode(col(f)))
    }
}

/** Interactive query layer (SURVEY.md §3.3): the reference's
  * `GET /api/v1/query/{source}` endpoints string-build SQL/filters and push
  * them to the source database; here they compile onto lake tables and
  * Catalyst executes. */
object QueryApi {

  /** `SELECT * FROM {table} [WHERE {where}] LIMIT {limit}` — the
    * postgres endpoint shape (`src/api/main.py:154-176`), parsed by
    * Spark SQL instead of string-shipped. */
  def sqlQuery(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      table: String, where: Option[String] = None,
      limit: Int = 100): DataFrame = {
    graft.Tables.registerAll(spark, sfDir)
    val w = where.map(x => s" WHERE $x").getOrElse("")
    spark.sql(s"SELECT * FROM $table$w LIMIT $limit")
  }

  /** The mongodb endpoint shape (`src/api/main.py:178-197`). */
  def findQuery(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      collection: String, filters: Map[String, Any],
      limit: Int = 100): DataFrame =
    Sources.collection(spark, sfDir, collection, filters, Some(limit))

  /** The influxdb endpoint shape (`src/api/main.py:199-221`). */
  def rangeQuery(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      measurement: String, tsCol: String, start: String,
      stop: String = "now()"): DataFrame =
    Sources.timeRange(spark, sfDir, measurement, tsCol, start, stop)
}
