package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column queries (training-data pipeline extensions).
  *
  * `mm_stats` is the metadata path — binary `content` never read
  * (columnar pruning; asserted in AnnMultimodalSpec). `mm_features`
  * exercises the real plumbing (binary payloads through the batched
  * mapPartitions decode stage); the stub codec's rolling byte sums are
  * replicated in the oracle over `hex(encode(text))` — the same UTF-8
  * bytes the Spark side wraps as the binary payload — so the decode
  * pipeline is value-checked end to end, not rows-only. */
object MultimodalQueries extends QuerySection {
  import Catalog.Q

  /** Metadata-only rollup over the media table: proves the plan prunes
    * the binary column (ReadSchema excludes `content`). */
  private def mmStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(Multimodal.demoMediaTable(s, dir))

  /** Feature-extraction pipeline: binary → batched stub decode →
    * feature columns. Features are (byteSum % 1000)/1000 floats; the
    * judged output rescales them back to the exact integer byte sums so
    * the comparison is integer-typed (no float-representation noise). */
  private def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.demoMediaTable(s, dir))
      .select(col("media_id"), col("media_type"),
        round(element_at(col("features"), 1) * 1000).cast("int").as("f0"),
        round(element_at(col("features"), 8) * 1000).cast("int").as("f7"))
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
        |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin,
    // the stub codec in SQL: UTF-8 byte stream (hex pairs), rolling sums
    // into 8 accumulators by byte position mod 8, mod 1000 — identical to
    // Multimodal.StubCodec.imageFeatures over the same payload bytes
    "mm_features" ->
      """WITH b AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    hex(encode(text)) AS hx
        |  FROM documents),
        |bytes AS (SELECT doc_id,
        |    unnest(generate_series(0, length(hx)//2 - 1)) AS j, hx FROM b),
        |acc AS (SELECT doc_id,
        |    sum(CASE WHEN j % 8 = 0 THEN
        |      CAST('0x' || substr(hx, CAST(2*j+1 AS INT), 2) AS INT) END)
        |      % 1000 AS f0,
        |    sum(CASE WHEN j % 8 = 7 THEN
        |      CAST('0x' || substr(hx, CAST(2*j+1 AS INT), 2) AS INT) END)
        |      % 1000 AS f7
        |  FROM bytes GROUP BY doc_id)
        |SELECT b.doc_id AS media_id, b.media_type,
        |  CAST(coalesce(f0, 0) AS INT) AS f0,
        |  CAST(coalesce(f7, 0) AS INT) AS f7
        |FROM b LEFT JOIN acc ON acc.doc_id = b.doc_id
        |ORDER BY media_id LIMIT 300""".stripMargin
  )
}
