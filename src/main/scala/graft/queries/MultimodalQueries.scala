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

  /** Resize stage: binary→binary map (no shuffle); judged on the
    * post-resize payload size and rewritten dimensions — the stub
    * "resize" is a deterministic truncation to max(16, w·h/64) bytes,
    * replayed in SQL over the same UTF-8 payload lengths. */
  private def mmResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizeImages(Multimodal.demoMediaTable(s, dir), w = 64, h = 64)
      .filter(col("media_type") === "image")
      .select(col("media_id"),
        length(col("content")).cast("long").as("n_bytes"),
        col("width"), col("height"))
      .orderBy(col("media_id")).limit(300)

  /** Frame sampling: video binaries explode into one row per kept
    * frame (every 4th 64-byte chunk); judged on per-frame byte counts
    * — chunk arithmetic replayed in SQL. */
  private def mmFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleVideoFrames(Multimodal.demoMediaTable(s, dir),
        everyN = 4)
      .filter(col("media_type") === "video")
      .select(col("media_id"), col("frame_no"),
        length(col("content")).cast("long").as("n_bytes"))
      .orderBy(col("media_id"), col("frame_no")).limit(500)

  /** Byte-level content dedup audit: every 97th media item is planted
    * a second time under a new id (the re-crawled-identical-file case),
    * and the duplicate-content groups — digest, copy count, surviving
    * id — must match DuckDB computing the identical md5 over the same
    * bytes. */
  private def mmDedup(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.demoMediaTable(s, dir)
    val planted = media.filter(col("media_id") % 97 === 0)
      .withColumn("media_id", col("media_id") + 1000000L)
    Multimodal.duplicateContentGroups(media.unionByName(planted))
      .orderBy(col("content_md5"))
  }

  /** FRAME-level cross-video dedup: re-encoded copies of a video share
    * its frames even when the container bytes differ — so dedup must
    * happen at the sampled-frame grain, not the file grain (`mm_dedup`).
    * Planted copies of every 93rd video re-enter under new ids; the
    * sampled frames are digested and every frame hash spanning ≥ 2
    * media ids surfaces with its copy count and keeper id. Only
    * (digest, media_id) pairs reach the exchange — frame bytes hash
    * inside the scan stage, same contract as `mm_dedup`. */
  private def mmFrameDedup(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.demoMediaTable(s, dir)
      .filter(col("media_type") === "video")
    val planted = media.filter(col("media_id") % 31 === 2)
      .withColumn("media_id", col("media_id") + 1000000L)
    Multimodal.sampleVideoFrames(media.unionByName(planted), everyN = 4)
      .select(md5(col("content")).as("frame_md5"), col("media_id"))
      .groupBy(col("frame_md5"))
      .agg(countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_frames"),
        min(col("media_id")).as("keeper"))
      .filter(col("n_media") >= 2)
      .orderBy(col("frame_md5"))
  }

  def queries: Map[String, Q] = Map(
    "mm_frame_dedup" -> (mmFrameDedup _),
    "mm_dedup" -> (mmDedup _),
    "mm_stats" -> (mmStats _),
    "mm_features" -> (mmFeatures _),
    "mm_resize" -> (mmResize _),
    "mm_frames" -> (mmFrames _)
  )

  def oracleSql: Map[String, String] = Map(
    "mm_frame_dedup" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  WHERE doc_id % 3 = 2
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 3 = 2 AND doc_id % 31 = 2),
        |chunks AS (
        |  SELECT media_id, substr(text, ci * 64 + 1, 64) AS frame
        |  FROM v, LATERAL (SELECT unnest(generate_series(0,
        |    CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1))
        |    AS ci) c
        |  WHERE ci % 4 = 0)
        |SELECT md5(frame) AS frame_md5,
        |  CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
        |  count(*) AS n_frames, min(media_id) AS keeper
        |FROM chunks GROUP BY 1
        |HAVING count(DISTINCT media_id) >= 2
        |ORDER BY frame_md5""".stripMargin,
    "mm_dedup" ->
      """WITH all_media AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 97 = 0)
        |SELECT md5(text) AS content_md5, count(*) AS n_copies,
        |  min(media_id) AS keeper
        |FROM all_media GROUP BY md5(text) HAVING count(*) > 1
        |ORDER BY content_md5""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id AS media_id,
        |  CAST(least(octet_length(encode(text)), 64) AS BIGINT)
        |    AS n_bytes,
        |  CAST(64 AS INT) AS width, CAST(64 AS INT) AS height
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY media_id LIMIT 300""".stripMargin,
    "mm_frames" ->
      """WITH v AS (SELECT doc_id AS media_id,
        |    octet_length(encode(text)) AS nb
        |  FROM documents WHERE doc_id % 3 = 2),
        |chunks AS (SELECT media_id, nb,
        |    unnest(generate_series(0,
        |      CAST(ceil(nb / 64.0) AS INT) - 1)) AS ci
        |  FROM v)
        |SELECT media_id, CAST(ci // 4 AS INT) AS frame_no,
        |  CAST(least(64, nb - ci * 64) AS BIGINT) AS n_bytes
        |FROM chunks WHERE ci % 4 = 0
        |ORDER BY media_id, frame_no LIMIT 500""".stripMargin,
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
