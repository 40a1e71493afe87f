package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{ImageIoCodec, Multimodal, SyntheticImages}

/** Multimodal-column queries (training-data pipeline extensions).
  *
  * `mm_stats` is the metadata path — binary `content` never read
  * (columnar pruning; asserted in AnnMultimodalSpec). `mm_features` /
  * `mm_resize` judge the REAL image path: actual PNG bytes through
  * `ImageIO` decode ([[graft.multimodal.ImageIoCodec]]) inside the
  * batched mapPartitions stages, against an oracle that recomputes the
  * procedural images' pixel statistics from their generating formula —
  * integer arithmetic only, no image library on the oracle side. The
  * `mm_frames` judges the REAL multi-frame path too: animated GIFs
  * through `ImageIO`'s frame reader (`ImageIoCodec.sampleFrames`) —
  * the JDK's one genuinely multi-frame container. The dedup queries
  * keep the stub codec (byte-grain dedup is codec-independent) and
  * value-check the plumbing over known byte payloads. */
object MultimodalQueries extends QuerySection {
  import Catalog.Q

  /** Metadata-only rollup over the media table: proves the plan prunes
    * the binary column (ReadSchema excludes `content`). */
  private def mmStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(Multimodal.demoMediaTable(s, dir))

  /** REAL decode, judged: procedural 32×16 grayscale PNGs
    * (`SyntheticImages.pngTable` — pixel formula `(7x+13y+31·id) mod
    * 256`) round-trip through actual `ImageIO` encode → decode inside
    * the batched `extractFeatures` stage with [[ImageIoCodec]], and the
    * 8-bucket luminance-histogram shares come out. The oracle never
    * decodes anything: it recomputes the expected per-bucket pixel
    * counts from the formula with integer arithmetic. Shares are
    * count/512 — dyadic, so float32 holds them EXACTLY and the compare
    * is bit-strict, no rounding. */
  private def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        SyntheticImages.pngTable(s, dir, n = 300),
        codec = ImageIoCodec)
      .select(col("media_id"), posexplode(col("features")))
      .select(col("media_id"), col("pos").as("bucket"),
        col("col").cast("double").as("share"))
      .orderBy(col("media_id"), col("bucket"))

  /** REAL resize, judged: the same PNGs go through
    * [[ImageIoCodec.resize]] (deterministic nearest-neighbor, 32×16 →
    * 16×8, re-encoded PNG) and THEN the real decode+histogram — so the
    * judged values prove the resample picked exactly the source pixels
    * `(2x, 2y)` the oracle's formula predicts. Payload byte length is
    * deliberately NOT judged (PNG container size is an encoder detail,
    * not semantics); the rewritten metadata dims are. */
  private def mmResize(s: SparkSession, dir: String): DataFrame = {
    val resized = Multimodal.resizeImages(
      SyntheticImages.pngTable(s, dir, n = 300), w = 16, h = 8,
      codec = ImageIoCodec)
    Multimodal.extractFeatures(resized, codec = ImageIoCodec)
      .select(col("media_id"), col("width"), col("height"),
        posexplode(col("features")))
      .select(col("media_id"), col("width"), col("height"),
        col("pos").as("bucket"), col("col").cast("double").as("share"))
      .orderBy(col("media_id"), col("bucket"))
  }

  /** REAL multi-frame decode, judged: procedural animated GIFs
    * (`SyntheticImages.gifTable` — `(id mod 4)+2` frames of 16×8 pixels,
    * per-frame formula `(7x+13y+31·id+59·f) mod 256`) explode through
    * `sampleVideoFrames` with [[ImageIoCodec]], whose `sampleFrames`
    * runs actual `ImageIO` animated-GIF decode, keeps every 2nd frame,
    * and re-encodes each as PNG. Each kept frame then goes through the
    * real decode+histogram (`extractFeatures`), so the judged shares
    * prove BOTH that the right frames were picked (frame_no ↔ f=2·no in
    * the formula) and that the GIF→PNG round-trip was pixel-exact. The
    * oracle replays the formula with integer arithmetic — shares are
    * count/128, dyadic, bit-strict. */
  private def mmFrames(s: SparkSession, dir: String): DataFrame = {
    val frames = Multimodal.sampleVideoFrames(
      SyntheticImages.gifTable(s, dir, n = 240), everyN = 2,
      codec = ImageIoCodec)
    Multimodal.extractFeatures(frames, codec = ImageIoCodec)
      .select(col("media_id"), col("frame_no"),
        posexplode(col("features")))
      .select(col("media_id"), col("frame_no"), col("pos").as("bucket"),
        col("col").cast("double").as("share"))
      .orderBy(col("media_id"), col("frame_no"), col("bucket"))
  }

  /** REAL video-CONTAINER decode, judged: procedural uncompressed-DIB
    * AVIs (`SyntheticImages.aviTable` — `(id mod 3)+2` frames of 16×8
    * pixels, per-frame formula `(5x+11y+23·id+47·f) mod 256`) walk the
    * hand-rolled RIFF/AVI parser (`AviCodec` — avih/strh/strf headers,
    * `movi` chunk scan, bottom-up BGR DIB rows) inside
    * `sampleVideoFrames`, keep every 2nd frame, re-encode as PNG, and
    * go through the real decode+histogram. The judged shares prove the
    * container walk found exactly the right frame chunks AND the DIB
    * row decode was pixel-exact. The oracle replays the formula with
    * integer arithmetic — shares are count/128, dyadic, bit-strict.
    * (MJPEG — the compressed AVI form — is spec-verified instead:
    * JPEG pixel output isn't bit-pinned across decoder libraries, so
    * it can't sit behind a hash oracle; see AviCodecSpec.) */
  private def mmVideo(s: SparkSession, dir: String): DataFrame = {
    val frames = Multimodal.sampleVideoFrames(
      SyntheticImages.aviTable(s, dir, n = 220), everyN = 2,
      codec = ImageIoCodec)
    Multimodal.extractFeatures(frames, codec = ImageIoCodec)
      .select(col("media_id"), col("frame_no"),
        posexplode(col("features")))
      .select(col("media_id"), col("frame_no"), col("pos").as("bucket"),
        col("col").cast("double").as("share"))
      .orderBy(col("media_id"), col("frame_no"), col("bucket"))
  }

  /** CONTENT-grain video dedup through the REAL container path — the
    * video analogue of `mm_audio_dedup`'s argument: a re-encoded copy
    * carries the SAME frames in DIFFERENT bytes (here: planted copies
    * of every 13th AVI gain a trailing junk byte the bounds-checked
    * RIFF walk never reaches — md5(content) differs, decoded frames
    * identical). Dedup therefore runs on the DECODED-frame-feature
    * grain: each video reduces to an exact orderless fingerprint
    * (row count + Σ share·(bucket+1)·(frame_no+1) — shares are /128
    * dyadic, so sums are EXACT in double under any order and the
    * formula oracle replays them bit-for-bit), and fingerprint groups
    * spanning ≥ 2 media surface with their keeper. Frame decode
    * happens inside the scan stage; only (id, frame, bucket, share)
    * rows reach the exchange — container bytes never shuffle. */
  private def mmVideoDedup(s: SparkSession, dir: String): DataFrame = {
    val base = SyntheticImages.aviTable(s, dir, n = 150)
    val planted = base.filter(col("media_id") % 13 === 0)
      .withColumn("media_id", col("media_id") + 1000000L)
      .withColumn("content", concat(col("content"),
        lit(Array(0x55.toByte))))
    val frames = Multimodal.sampleVideoFrames(
      base.unionByName(planted), everyN = 1, codec = ImageIoCodec)
    val feats = Multimodal.extractFeatures(frames, codec = ImageIoCodec)
      .select(col("media_id"), col("frame_no"),
        posexplode(col("features")))
      .select(col("media_id"), col("frame_no"), col("pos").as("bucket"),
        col("col").cast("double").as("share"))
    val fp = feats.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("share") * (col("bucket") + 1) * (col("frame_no") + 1))
          .as("f1"))
    fp.groupBy(col("f1"), col("n_rows"))
      .agg(count(lit(1)).as("n_media"), min(col("media_id")).as("keeper"))
      .filter(col("n_media") >= 2)
      .orderBy(col("keeper"))
  }

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

  /** REAL audio decode, judged: procedural 16-bit PCM WAVs
    * (`SyntheticImages.wavTable` — hand-rolled RIFF headers, sample
    * formula `((i·37 + id·101) mod 2003) − 1001`) parse back through
    * `javax.sound.sampled` inside the batched `extractAudioWindows`
    * stage with [[ImageIoCodec]]; each full 256-sample window reduces
    * to mean-square energy (Σs²/256 — dyadic, exact) and the
    * zero-crossing count (integer). The oracle replays the formula
    * over generate_series — integer arithmetic, no audio library. */
  private def mmAudio(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractAudioWindows(
        SyntheticImages.wavTable(s, dir, n = 200), codec = ImageIoCodec)
      .select(col("media_id"), col("window_no"), col("mean_square"),
        col("zero_crossings"))
      .orderBy(col("media_id"), col("window_no"))

  /** CONTENT-grain audio dedup — the case byte-level `mm_dedup`
    * structurally misses: a re-encoded copy carries the SAME samples
    * in DIFFERENT bytes (here: planted copies of every 41st WAV gain a
    * trailing junk byte the RIFF parser ignores — md5(content)
    * differs, decoded PCM identical; spec asserts both halves). Dedup
    * therefore runs on the DECODED-feature grain: each file reduces to
    * an exact orderless fingerprint (window count + Σ mean_square·(w+1)
    * + Σ zero_crossings·(w+1) — dyadic/integer arithmetic, so the
    * formula oracle replays it bit-exactly), and fingerprint groups
    * spanning ≥ 2 media surface with their keeper. The audio analogue
    * of `mm_frame_dedup`'s frame-grain argument; perceptual (near-dup)
    * matching would layer MinHash over quantized features at this same
    * grain. */
  private def mmAudioDedup(s: SparkSession, dir: String): DataFrame = {
    val base = SyntheticImages.wavTable(s, dir, n = 150)
    val planted = base.filter(col("media_id") % 41 === 0)
      .withColumn("media_id", col("media_id") + 1000000L)
      .withColumn("content", concat(col("content"),
        lit(Array(0x7F.toByte))))
    val wins = Multimodal.extractAudioWindows(
      base.unionByName(planted), codec = ImageIoCodec)
    wins.groupBy(col("media_id"))
      .agg(count(lit(1)).as("nw"),
        sum(col("mean_square") * (col("window_no") + 1)).as("f1"),
        sum(col("zero_crossings") * (col("window_no") + 1)).as("f2"))
      .groupBy(col("f1"), col("f2"), col("nw"))
      .agg(countDistinct(col("media_id")).as("n_media"),
        min(col("media_id")).as("keeper"))
      .filter(col("n_media") >= 2)
      .orderBy(col("keeper"))
  }

  /** PCM-in-MP4 REAL audio decode, judged — the audio twin of
    * `mm_mp4_frames` (`SyntheticImages.pcmMp4Table`): 16-bit mono PCM
    * rides real `sowt`/`twos` sample entries (endianness alternating
    * by id parity), the samples resolve through the same
    * `stsc`/`stco`/`co64` range machinery as MJPEG, and their
    * concatenation windows into (mean-square, zero-crossing) pairs —
    * integer arithmetic end to end, so unlike JPEG the oracle is
    * BIT-STRICT: the identical formula SQL that judges the WAV route
    * (`mm_audio`) judges this one, proving route equivalence. */
  private def mmMp4Audio(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractAudioWindows(
        SyntheticImages.pcmMp4Table(s, dir, n = 2, modDen = 5),
        codec = ImageIoCodec)
      .select(col("media_id"), col("window_no"), col("mean_square"),
        col("zero_crossings"))
      .orderBy(col("media_id"), col("window_no"))

  /** REAL ISO-BMFF container walk, judged: procedural standards-shaped
    * MP4s (`SyntheticImages.mp4Table` — every metadata field a pure
    * formula of the id; FullBox v0 AND v1 time layouts, 16.16
    * fixed-point dimensions, cycling sample-entry fourccs, a second
    * audio track on odd ids, and a 64-bit-largesize `mdat` before the
    * trailing `moov` on every 5th id) go through
    * [[Multimodal.probeMp4Meta]], which must walk the actual box bytes
    * ([[graft.multimodal.Mp4Codec]]) — the oracle recomputes every
    * field from the generating formulas with integer arithmetic. This
    * is the no-decoder curation probe (duration/dims/codec gates) a
    * video corpus runs before paying for any sample decode. */
  private def mmMp4Meta(s: SparkSession, dir: String): DataFrame =
    Multimodal.probeMp4Meta(SyntheticImages.mp4Table(s, dir, n = 2, modDen = 5))
      .orderBy(col("media_id"))

  /** Per-track MP4 SAMPLE-TABLE stats ([[Multimodal.probeMp4Tracks]]
    * over the same procedural corpus as `mm_mp4_meta`): sample counts,
    * duration-weighted fps, average bitrate and keyframe density read
    * from the real `stsz`/`stts`/`stss` bytes — what a 100 TB video
    * curation pass actually thresholds on, and all of it available
    * WITHOUT a codec. The oracle recomputes every integer fact from
    * the generating formulas (sample sizes summed via
    * generate_series, the two-run stts duration, the every-s-th
    * stss count, the all-sync branch on id ≡ 0 mod 6) and derives the
    * same rounded ratios from the same exact-integer quotients. */
  private def mmMp4Stats(s: SparkSession, dir: String): DataFrame =
    Multimodal.probeMp4Tracks(SyntheticImages.mp4Table(s, dir, n = 2, modDen = 5))
      .orderBy(col("media_id"), col("track"))

  /** Byte-exact MP4 SAMPLE extraction, judged: the procedural
    * formula-ASCII corpus (`SyntheticImages.mp4AsciiTable` — samples
    * in chunks of `(id mod 3)+1` with a trailing partial chunk,
    * `co64` vs `stco`, largesize `mdat`, junk prefix bytes) goes
    * through [[Multimodal.probeMp4Samples]], which must resolve
    * `stsz`/`stsc`/`stco`/`co64` into exact `mdat` byte ranges. The
    * oracle replays each payload STRING from the generating formula —
    * a hash-strict compare of the extracted bytes themselves. */
  private def mmMp4Samples(s: SparkSession, dir: String): DataFrame =
    Multimodal.probeMp4Samples(
        SyntheticImages.mp4AsciiTable(s, dir, n = 9, modDen = 25))
      .orderBy(col("media_id"), col("sample_no"))

  /** MJPEG-in-MP4 REAL sample decode, judged at the GROUP-STRUCTURE
    * grain (`SyntheticImages.mjpegMp4Table`): every 11th file is
    * planted again under a new id with COM-injected (byte-different,
    * pixel-identical) JPEG samples and a DIFFERENT chunk layout +
    * offset form — so the copy matches its original only if sample
    * ranges resolve correctly under BOTH layouts and the extracted
    * JPEGs really decode (byte-grain dedup cannot match them). Each
    * decoded frame reduces to md5 of its re-encoded pixels; digest
    * groups spanning ≥ 2 media surface with keeper and counts, which
    * the generating formula predicts exactly — the same
    * dedup-as-oracle argument as `mm_video_dedup`, applied to the one
    * standards-real MP4 video form the JDK can decode. */
  private def mmMp4Frames(s: SparkSession, dir: String): DataFrame = {
    val frames = Multimodal.sampleVideoFrames(
      SyntheticImages.mjpegMp4Table(s, dir, n = 3, modDen = 10), everyN = 1,
      codec = ImageIoCodec)
    frames.select(md5(col("content")).as("px"), col("media_id"),
        col("frame_no"))
      .groupBy(col("px"))
      .agg(countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_frames"),
        min(col("media_id")).as("keeper"),
        min(col("frame_no")).as("frame_no"))
      .filter(col("n_media") >= 2)
      .select(col("keeper"), col("frame_no"), col("n_media"),
        col("n_frames"))
      .orderBy(col("keeper"), col("frame_no"))
  }

  def queries: Map[String, Q] = Map(
    "mm_mp4_samples" -> (mmMp4Samples _),
    "mm_mp4_frames" -> (mmMp4Frames _),
    "mm_mp4_audio" -> (mmMp4Audio _),
    "mm_mp4_stats" -> (mmMp4Stats _),
    "mm_mp4_meta" -> (mmMp4Meta _),
    "mm_audio_dedup" -> (mmAudioDedup _),
    "mm_audio" -> (mmAudio _),
    "mm_frame_dedup" -> (mmFrameDedup _),
    "mm_dedup" -> (mmDedup _),
    "mm_stats" -> (mmStats _),
    "mm_features" -> (mmFeatures _),
    "mm_resize" -> (mmResize _),
    "mm_frames" -> (mmFrames _),
    "mm_video" -> (mmVideo _),
    "mm_video_dedup" -> (mmVideoDedup _)
  )

  def oracleSql: Map[String, String] = Map(
    // byte-exact extraction oracle: the engine resolves real
    // stsz/stsc/stco/co64 tables into mdat ranges; DuckDB replays the
    // formula-ASCII payload strings directly
    "mm_mp4_samples" ->
      """WITH ids AS (SELECT doc_id AS media_id,
        |    CAST(doc_id % 4 + 3 AS INT) AS n
        |  FROM documents WHERE doc_id % 25 < 9),
        |s AS (SELECT media_id, CAST(i AS INT) AS sample_no,
        |    'S' || CAST(media_id AS VARCHAR) || ':' ||
        |      CAST(i AS VARCHAR) || ':' ||
        |      repeat(chr(CAST(97 + (media_id + i) % 26 AS INT)),
        |        CAST(10 + (media_id * 7 + i * 13) % 37 AS INT))
        |      AS payload
        |  FROM ids, LATERAL (SELECT unnest(generate_series(0, n - 1))
        |    AS i) g)
        |SELECT media_id, sample_no, payload,
        |  CAST(length(payload) AS BIGINT) AS n_bytes
        |FROM s ORDER BY media_id, sample_no""".stripMargin,
    // group-structure oracle: each planted (id ≡ 0 mod 11) file pairs
    // with its byte-different copy frame-for-frame — 2 media, 2
    // frames per group, keeper = the original id
    "mm_mp4_frames" ->
      """WITH ids AS (SELECT doc_id AS fid,
        |    CAST(doc_id % 3 + 2 AS INT) AS nf
        |  FROM documents
        |  WHERE doc_id % 10 < 3 AND doc_id % 11 = 0)
        |SELECT fid AS keeper, CAST(f AS INT) AS frame_no,
        |  CAST(2 AS BIGINT) AS n_media, CAST(2 AS BIGINT) AS n_frames
        |FROM ids, LATERAL (SELECT unnest(generate_series(0, nf - 1))
        |  AS f) g
        |ORDER BY keeper, frame_no""".stripMargin,
    // formula oracle: every metadata field of the procedural MP4s is a
    // pure integer function of the id — the engine must recover each
    // from the real box bytes (duration_ms is floor division, exact in
    // BIGINT on both sides)
    // per-track sample-table formulas replayed in pure integer
    // arithmetic; the ratio columns divide the SAME exact integers and
    // round identically on both engines
    "mm_mp4_stats" ->
      """WITH p AS (SELECT doc_id AS media_id,
        |    8 * (doc_id % 5 + 1) AS n,
        |    100 * (doc_id % 3 + 1) AS d1,
        |    600 * (doc_id % 2 + 1) AS mts,
        |    doc_id % 4 + 2 AS s,
        |    doc_id % 6 <> 0 AS has_stss
        |  FROM documents WHERE doc_id % 5 < 2),
        |sz AS (SELECT media_id,
        |    CAST(sum(50 + (media_id * 31 + i * 17) % 211) AS BIGINT)
        |      AS total_bytes
        |  FROM p, LATERAL (SELECT unnest(generate_series(0, n - 1))
        |    AS i) g
        |  GROUP BY media_id),
        |v AS (SELECT p.media_id, 1 AS track, 'vide' AS handler,
        |    CASE media_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4v'
        |      ELSE 'hvc1' END AS codec,
        |    CAST(mts AS BIGINT) AS media_timescale,
        |    CAST(n AS BIGINT) AS n_samples,
        |    CAST((n // 2) * d1 + (n - n // 2) * (d1 + 50) AS BIGINT)
        |      AS duration_units,
        |    sz.total_bytes,
        |    CAST(CASE WHEN has_stss THEN 1 + (n - 1) // s ELSE n END
        |      AS BIGINT) AS n_keyframes
        |  FROM p JOIN sz USING (media_id)),
        |a AS (SELECT media_id, 2 AS track, 'soun' AS handler,
        |    'mp4a' AS codec, CAST(8000 AS BIGINT) AS media_timescale,
        |    CAST(10 AS BIGINT) AS n_samples,
        |    CAST(1600 AS BIGINT) AS duration_units,
        |    CAST(640 AS BIGINT) AS total_bytes,
        |    CAST(10 AS BIGINT) AS n_keyframes
        |  FROM p WHERE media_id % 2 = 1),
        |u AS (SELECT * FROM v UNION ALL SELECT * FROM a)
        |SELECT media_id, CAST(track AS INT) AS track, handler, codec,
        |  media_timescale, n_samples, duration_units, total_bytes,
        |  n_keyframes,
        |  round(CAST(n_samples * media_timescale AS DOUBLE)
        |    / duration_units, 4) AS fps,
        |  round(CAST(8 * total_bytes * media_timescale AS DOUBLE)
        |    / duration_units, 2) AS bitrate_bps,
        |  round(CAST(n_keyframes AS DOUBLE) / n_samples, 4)
        |    AS keyframe_density
        |FROM u ORDER BY media_id, track""".stripMargin,
    "mm_mp4_meta" ->
      """SELECT doc_id AS media_id, 'isom' AS brand,
        |  600 * (doc_id % 4 + 1) AS timescale,
        |  ((600 * (doc_id % 4 + 1)) * (doc_id % 7 + 1) + doc_id % 97)
        |    * 1000 // (600 * (doc_id % 4 + 1)) AS duration_ms,
        |  CAST(doc_id % 2 + 1 AS INT) AS n_tracks,
        |  CAST(16 * (doc_id % 5 + 1) AS INT) AS width,
        |  CAST(16 * (doc_id % 3 + 1) AS INT) AS height,
        |  CASE doc_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4v'
        |    ELSE 'hvc1' END AS video_codec,
        |  CASE WHEN doc_id % 2 = 1 THEN 'mp4a' ELSE NULL END
        |    AS audio_codec
        |FROM documents WHERE doc_id % 5 < 2
        |ORDER BY media_id""".stripMargin,
    // frame-feature-grain dedup oracle: planted trailing-byte copies
    // decode to the ORIGINAL id's frames, so fid drives the formula;
    // f1 terms are (cnt/128)·(bucket+1)·(f+1) — dyadic, order-exact
    "mm_video_dedup" ->
      """WITH ids0 AS (
        |  SELECT doc_id AS media_id, doc_id AS fid FROM documents
        |  WHERE doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 13 = 0),
        |ids AS (SELECT media_id, fid,
        |    CAST(fid % 3 + 2 AS INT) AS nf FROM ids0),
        |fr AS (SELECT media_id, fid, CAST(f AS INT) AS f
        |  FROM ids, LATERAL (SELECT unnest(generate_series(0, nf - 1))
        |    AS f) g),
        |px AS (SELECT media_id, f,
        |    CAST((x*5 + y*11 + fid*23 + f*47) % 256 AS INT) AS lum
        |  FROM fr,
        |    (SELECT unnest(generate_series(0, 15)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |hist AS (SELECT media_id, f, lum // 32 AS bucket,
        |    count(*) AS cnt
        |  FROM px GROUP BY 1, 2, 3),
        |fp AS (SELECT h.media_id,
        |    sum((h.cnt / 128.0) * (h.bucket + 1) * (h.f + 1)) AS f1
        |  FROM hist h GROUP BY 1),
        |fpn AS (SELECT i.media_id, CAST(8 * i.nf AS BIGINT) AS n_rows,
        |    p.f1
        |  FROM ids i JOIN fp p USING (media_id))
        |SELECT f1, n_rows, CAST(count(*) AS BIGINT) AS n_media,
        |  min(media_id) AS keeper
        |FROM fpn GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY keeper""".stripMargin,
    // REAL-container oracle: the engine must walk actual RIFF/AVI bytes
    // and decode DIB rows; DuckDB replays the generator's per-frame
    // pixel formula. Kept frames are f ∈ {0,2} of (id%3)+2 total;
    // shares /128 dyadic, bit-strict.
    "mm_video" ->
      """WITH ids AS (SELECT doc_id AS media_id,
        |    CAST(doc_id % 3 + 2 AS INT) AS nf
        |  FROM documents WHERE doc_id < 220),
        |fr AS (SELECT media_id, CAST(f AS INT) AS f,
        |    CAST(f // 2 AS INT) AS frame_no
        |  FROM ids, LATERAL (SELECT unnest(generate_series(0, nf - 1))
        |    AS f) g
        |  WHERE f % 2 = 0),
        |px AS (SELECT media_id, frame_no,
        |    CAST((x*5 + y*11 + media_id*23 + f*47) % 256 AS INT) AS lum
        |  FROM fr,
        |    (SELECT unnest(generate_series(0, 15)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |hist AS (SELECT media_id, frame_no, lum // 32 AS bucket,
        |    count(*) AS cnt
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT f.media_id, f.frame_no, CAST(b.bucket AS INT) AS bucket,
        |  coalesce(h.cnt, 0) / 128.0 AS share
        |FROM fr f
        |CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bucket) b
        |LEFT JOIN hist h ON h.media_id = f.media_id
        |  AND h.frame_no = f.frame_no AND h.bucket = b.bucket
        |ORDER BY f.media_id, f.frame_no, bucket""".stripMargin,
    // feature-grain dedup oracle: the planted trailing-byte copies
    // decode to the ORIGINAL id's samples, so fid drives the formula
    "mm_audio_dedup" ->
      """WITH ids0 AS (
        |  SELECT doc_id AS media_id, doc_id AS fid FROM documents
        |  WHERE doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents
        |  WHERE doc_id < 150 AND doc_id % 41 = 0),
        |ids AS (SELECT media_id, fid,
        |    CAST(512 + (fid % 3) * 256 AS INT) AS ns FROM ids0),
        |smp AS (SELECT media_id, i,
        |    (i * 37 + fid * 101) % 2003 - 1001 AS s
        |  FROM ids, LATERAL (SELECT unnest(generate_series(0, ns - 1))
        |    AS i) g),
        |win AS (SELECT media_id, CAST(i // 256 AS INT) AS w, s,
        |    lag(s) OVER (PARTITION BY media_id, i // 256 ORDER BY i)
        |      AS prev
        |  FROM smp),
        |wa AS (SELECT media_id, w,
        |    CAST(sum(s * s) AS DOUBLE) / 256.0 AS msq,
        |    count(CASE WHEN prev * s < 0 THEN 1 END) AS zc
        |  FROM win GROUP BY 1, 2),
        |fp AS (SELECT media_id, count(*) AS nw,
        |    sum(msq * (w + 1)) AS f1,
        |    CAST(sum(zc * (w + 1)) AS BIGINT) AS f2
        |  FROM wa GROUP BY media_id)
        |SELECT f1, f2, nw, CAST(count(*) AS BIGINT) AS n_media,
        |  min(media_id) AS keeper
        |FROM fp GROUP BY f1, f2, nw HAVING count(*) >= 2
        |ORDER BY keeper""".stripMargin,
    // the PCM-in-MP4 route shares mm_audio's generating formula, so
    // the IDENTICAL oracle judges it — route equivalence by shared
    // oracle, the strongest form of the claim
    "mm_mp4_audio" ->
      """WITH ids AS (SELECT doc_id AS media_id,
        |    CAST(512 + (doc_id % 3) * 256 AS INT) AS ns
        |  FROM documents WHERE doc_id % 5 < 2),
        |smp AS (SELECT media_id, i,
        |    (i * 37 + media_id * 101) % 2003 - 1001 AS s
        |  FROM ids, LATERAL (SELECT unnest(generate_series(0, ns - 1))
        |    AS i) g),
        |win AS (SELECT media_id, CAST(i // 256 AS INT) AS w, s,
        |    lag(s) OVER (PARTITION BY media_id, i // 256 ORDER BY i)
        |      AS prev
        |  FROM smp)
        |SELECT media_id, w AS window_no,
        |  CAST(sum(s * s) AS DOUBLE) / 256.0 AS mean_square,
        |  CAST(count(CASE WHEN prev * s < 0 THEN 1 END) AS BIGINT)
        |    AS zero_crossings
        |FROM win GROUP BY 1, 2
        |ORDER BY media_id, window_no""".stripMargin,
    // REAL-audio oracle: the engine must parse actual RIFF/WAV bytes;
    // DuckDB replays the PCM formula. Σs²/256.0 is dyadic-exact.
    "mm_audio" ->
      """WITH ids AS (SELECT doc_id AS media_id,
        |    CAST(512 + (doc_id % 3) * 256 AS INT) AS ns
        |  FROM documents WHERE doc_id < 200),
        |smp AS (SELECT media_id, i,
        |    (i * 37 + media_id * 101) % 2003 - 1001 AS s
        |  FROM ids, LATERAL (SELECT unnest(generate_series(0, ns - 1))
        |    AS i) g),
        |win AS (SELECT media_id, CAST(i // 256 AS INT) AS w, s,
        |    lag(s) OVER (PARTITION BY media_id, i // 256 ORDER BY i)
        |      AS prev
        |  FROM smp)
        |SELECT media_id, w AS window_no,
        |  CAST(sum(s * s) AS DOUBLE) / 256.0 AS mean_square,
        |  CAST(count(CASE WHEN prev * s < 0 THEN 1 END) AS BIGINT)
        |    AS zero_crossings
        |FROM win GROUP BY 1, 2
        |ORDER BY media_id, window_no""".stripMargin,
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
    // nearest-neighbor 32×16 → 16×8 keeps exactly source pixels
    // (2x, 2y); expected shares recomputed from the pixel FORMULA —
    // integer arithmetic, /128.0 dyadic-exact
    "mm_resize" ->
      """WITH ids AS (SELECT doc_id AS media_id FROM documents
        |  WHERE doc_id < 300),
        |px AS (SELECT media_id,
        |    CAST(((2*x)*7 + (2*y)*13 + media_id*31) % 256 AS INT) AS lum
        |  FROM ids,
        |    (SELECT unnest(generate_series(0, 15)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |hist AS (SELECT media_id, lum // 32 AS bucket, count(*) AS cnt
        |  FROM px GROUP BY 1, 2)
        |SELECT i.media_id, CAST(16 AS INT) AS width,
        |  CAST(8 AS INT) AS height, CAST(b.bucket AS INT) AS bucket,
        |  coalesce(h.cnt, 0) / 128.0 AS share
        |FROM ids i
        |CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bucket) b
        |LEFT JOIN hist h ON h.media_id = i.media_id
        |  AND h.bucket = b.bucket
        |ORDER BY i.media_id, bucket""".stripMargin,
    // REAL-decode oracle for the multi-frame path: kept frames are
    // f ∈ {0,2,4} of (id%4)+2 total; per-frame luminance formula
    // replayed over generate_series, bucketed //32, shares /128 dyadic
    "mm_frames" ->
      """WITH ids AS (SELECT doc_id AS media_id,
        |    CAST(doc_id % 4 + 2 AS INT) AS nf
        |  FROM documents WHERE doc_id < 240),
        |fr AS (SELECT media_id, CAST(f AS INT) AS f,
        |    CAST(f // 2 AS INT) AS frame_no
        |  FROM ids, LATERAL (SELECT unnest(generate_series(0, nf - 1))
        |    AS f) g
        |  WHERE f % 2 = 0),
        |px AS (SELECT media_id, frame_no,
        |    CAST((x*7 + y*13 + media_id*31 + f*59) % 256 AS INT) AS lum
        |  FROM fr,
        |    (SELECT unnest(generate_series(0, 15)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |hist AS (SELECT media_id, frame_no, lum // 32 AS bucket,
        |    count(*) AS cnt
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT f.media_id, f.frame_no, CAST(b.bucket AS INT) AS bucket,
        |  coalesce(h.cnt, 0) / 128.0 AS share
        |FROM fr f
        |CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bucket) b
        |LEFT JOIN hist h ON h.media_id = f.media_id
        |  AND h.frame_no = f.frame_no AND h.bucket = b.bucket
        |ORDER BY f.media_id, f.frame_no, bucket""".stripMargin,
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
    // REAL-decode oracle: the engine must ImageIO-encode + decode
    // actual PNG bytes; DuckDB just replays the generator's pixel
    // formula (7x + 13y + 31·id) mod 256 and buckets luminance by //32.
    // Shares are count/512.0 — dyadic-exact, so no rounding either side
    "mm_features" ->
      """WITH ids AS (SELECT doc_id AS media_id FROM documents
        |  WHERE doc_id < 300),
        |px AS (SELECT media_id,
        |    CAST((x*7 + y*13 + media_id*31) % 256 AS INT) AS lum
        |  FROM ids,
        |    (SELECT unnest(generate_series(0, 31)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 15)) AS y) ys),
        |hist AS (SELECT media_id, lum // 32 AS bucket, count(*) AS cnt
        |  FROM px GROUP BY 1, 2)
        |SELECT i.media_id, CAST(b.bucket AS INT) AS bucket,
        |  coalesce(h.cnt, 0) / 512.0 AS share
        |FROM ids i
        |CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bucket) b
        |LEFT JOIN hist h ON h.media_id = i.media_id
        |  AND h.bucket = b.bucket
        |ORDER BY i.media_id, bucket""".stripMargin
  )
}
