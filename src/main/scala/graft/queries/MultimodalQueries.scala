package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column queries (training-data pipeline extensions).
  *
  * `mm_stats` is the metadata path — binary `content` never read
  * (columnar pruning; asserted in AnnMultimodalSpec) — and is fully
  * SQL-expressible, so it gets a DuckDB oracle. `mm_features` exercises
  * the real plumbing (binary payloads through the batched mapPartitions
  * decode stage); the stub codec's byte arithmetic has no reasonable
  * SQL form, so it ships as a deterministic rows-only query. */
object MultimodalQueries extends QuerySection {
  import Catalog.Q

  /** Metadata-only rollup over the media table: proves the plan prunes
    * the binary column (ReadSchema excludes `content`). */
  private def mmStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(Multimodal.demoMediaTable(s, dir))

  /** Feature-extraction pipeline: binary → batched stub decode →
    * per-type feature aggregate. Deterministic (features are pure
    * functions of the payload bytes); rows-only judged. */
  private def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.demoMediaTable(s, dir))
      .select(col("media_id"), col("media_type"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
        round(element_at(col("features"), 8).cast("double"), 4).as("f7"))
      .orderBy(col("media_id")).limit(300)

  def queries: Map[String, Q] = Map(
    "mm_stats" -> (mmStats _),
    "mm_features" -> (mmFeatures _)
  )

  def oracleSql: Map[String, String] = Map(
    "mm_stats" ->
      """WITH m AS (SELECT
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    CAST(n_chars % 1920 AS INT) AS width,
        |    n_chars * 10 AS duration_ms
        |  FROM documents)
        |SELECT media_type, count(*) AS n,
        |  CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms,
        |  max(width) AS max_width
        |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin
  )
}
