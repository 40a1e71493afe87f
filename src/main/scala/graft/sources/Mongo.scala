package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S2's PRODUCTION mapping — the MongoDB option seam, in the
  * [[JdbcSource]] style.
  *
  * The reference's Mongo extractor drives `collection.find(filter_dict)
  * .sort(sort).limit(limit)` over a live database
  * (`mongo_connector.py:95-116`). The Spark-production form of the same
  * contract is the MongoDB Spark connector reading an AGGREGATION
  * PIPELINE: the filter dict compiles to a `$match` stage (evaluated
  * server-side, so the predicate pushes down exactly like the raw
  * cursor filter), sort/limit to `$sort`/`$limit` stages, and
  * parallelism comes from the connector's sample partitioner — the
  * cursor pagination becomes partition math, as with JDBC.
  *
  * No database exists in this sandbox, so the seam is exercised at the
  * option-compilation level (SourcesSpec asserts the exact pipeline
  * JSON and reader options) while `load()` is the one-liner a
  * deployment calls. The dev surface over lake tables with the same
  * semantics is `Sources.collection` (S2) — this seam is its
  * production twin.
  */
final case class MongoSource(
    uri: String,
    database: String,
    collection: String,
    filterDict: Map[String, Any] = Map.empty,
    sort: Seq[(String, Int)] = Nil,
    limit: Option[Int] = None,
    partitionField: String = "_id",
    partitionSizeMb: Int = 64) {

  require(uri.startsWith("mongodb://") || uri.startsWith("mongodb+srv://"),
    s"not a mongodb uri: $uri")
  require(database.nonEmpty && collection.nonEmpty,
    "database and collection are required")
  require(sort.forall { case (_, d) => d == 1 || d == -1 },
    s"sort directions must be 1 or -1 (pymongo convention): $sort")
  require(limit.forall(_ > 0), s"limit must be positive: $limit")
  require(partitionSizeMb > 0, "partitionSizeMb must be positive")

  /** JSON-encode a filter value: strings quoted+escaped, numbers and
    * booleans bare, nested maps (operator objects like
    * `{"$gte": 100}`) recursively. Map keys are sorted so the
    * compiled artifact is deterministic regardless of Scala Map
    * iteration order. */
  private def encode(v: Any): String = v match {
    case null => "null"
    case s: String =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double =>
      require(!d.isNaN && !d.isInfinite,
        s"non-finite filter value cannot be JSON-encoded: $d")
      // integer rendering only where Long round-trips EXACTLY; a
      // 1e20-style value must stay in decimal form, not saturate at
      // Long.MaxValue and silently change the pushed predicate
      if (d == d.floor && math.abs(d) < 9.007199254740992e15)
        d.toLong.toString
      else d.toString
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
      .map { case (k, x) => encode(k) + ": " + encode(x) }
      .mkString("{", ", ", "}")
    case xs: Seq[_] => xs.map(encode).mkString("[", ", ", "]")
    case other => throw new IllegalArgumentException(
      s"unsupported filter value type: ${other.getClass.getName}")
  }

  /** The compiled aggregation pipeline — `$match` from the filter
    * dict (AND semantics per key, matching `collection.find`), then
    * `$sort`, then `$limit`, in cursor order. Empty stages are
    * omitted; an empty pipeline compiles to `[]`. */
  def pipelineJson: String = {
    val stages = Seq.newBuilder[String]
    if (filterDict.nonEmpty)
      stages += "{\"$match\": " + encode(filterDict) + "}"
    if (sort.nonEmpty)
      stages += sort.map { case (f, d) => encode(f) + ": " + d }
        .mkString("{\"$sort\": {", ", ", "}}")
    limit.foreach(n => stages += s"""{"$$limit": $n}""")
    stages.result().mkString("[", ", ", "]")
  }

  /** The compiled reader options for `spark.read.format("mongodb")`
    * (MongoDB Spark connector v10 option names): pipeline pushdown +
    * sample partitioner sized in MB — the parallel-read counterpart of
    * the reference's single cursor. */
  def options: Map[String, String] = Map(
    "connection.uri" -> uri,
    "database" -> database,
    "collection" -> collection,
    "aggregation.pipeline" -> pipelineJson,
    "partitioner" ->
      "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
    "partitioner.options.partition.field" -> partitionField,
    "partitioner.options.partition.size" -> s"${partitionSizeMb}MB")

  /** The deployment call (not invocable in this sandbox: no database,
    * no connector jar; everything above it is). */
  def load(spark: SparkSession): DataFrame =
    spark.read.format("mongodb").options(options).load()
}
