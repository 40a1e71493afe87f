package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.MediaCodec

/** A REAL media codec behind the [[Multimodal.MediaCodec]] seam, built
  * entirely on the JDK (no external libraries, so it runs in this
  * sandbox): PNG/BMP/GIF image decode, deterministic nearest-neighbor
  * resize, luminance-histogram pixel features, RIFF/WAV PCM audio
  * decode, and video-container frame extraction — animated GIF via
  * `ImageIO`'s frame reader, AVI (uncompressed DIB + MJPEG) via the
  * hand-rolled RIFF walker in [[AviCodec]]. Only inter-frame codecs
  * (MP4/H.264, WebM, MP3/AAC) still need a deploy-time library at this
  * seam — the JDK genuinely has no decoder for those.
  *
  * Determinism notes (the codec contract's hardest clause):
  *  - decode of lossless formats (PNG/BMP) yields exact pixel values on
  *    any JVM — `getRGB` returns the same ints everywhere;
  *  - features are INTEGER arithmetic until one final exact division:
  *    ITU-R 601 luminance `(299r + 587g + 114b) / 1000` (integer), a
  *    `lum·dims/256` bucket, and `count / pixels` shares — with
  *    power-of-two pixel counts the share is a dyadic rational, exact
  *    in float32 and bit-equal to any other engine's double division;
  *  - resize NEVER goes through `Graphics2D` (platform-dependent
  *    filtering): it samples source pixel `(x·sw/tw, y·sh/th)` (integer
  *    floor) per target pixel — the standard nearest-neighbor formula,
  *    replayable in SQL.
  */
object ImageIoCodec extends MediaCodec {
  // keep ImageIO off executor local disks (in-memory streams only)
  ImageIO.setUseCache(false)

  private def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else Option(
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }) // corrupt blob ⇒ None, not a task kill

  private def encodePng(img: BufferedImage): Array[Byte] = {
    // normalize to packed RGB first: the JDK PNG writer scrambles
    // indexed (palette) images — a GIF frame that reads pixel-correct
    // via getRGB came back wrong after an indexed-PNG round trip
    // (measured: 31 → 98). The copy is an exact per-pixel setRGB loop,
    // never Graphics2D (platform-dependent filtering).
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val out = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            out.setRGB(x, y, img.getRGB(x, y) & 0xFFFFFF)
            x += 1
          }
          y += 1
        }
        out
      }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(rgb, "png", bos)
    bos.toByteArray
  }

  /** ITU-R 601 integer luminance of a packed RGB int. */
  private def lum(rgb: Int): Int =
    (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
      (rgb & 0xFF) * 114) / 1000

  /** Normalized `dims`-bucket luminance histogram of the decoded
    * pixels; zero vector for undecodable input (contract: total). */
  override def imageFeatures(bytes: Array[Byte],
      dims: Int = 8): Array[Float] = decode(bytes) match {
    case None => Array.fill(dims)(0f)
    case Some(img) =>
      val w = img.getWidth
      val h = img.getHeight
      val counts = new Array[Long](dims)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          counts(lum(img.getRGB(x, y)) * dims / 256) += 1L
          x += 1
        }
        y += 1
      }
      val total = w.toLong * h
      counts.map(c => (c.toDouble / total).toFloat)
  }

  /** Nearest-neighbor resample to exactly (w, h), re-encoded as PNG.
    * Undecodable input passes through unchanged (total, well-formed). */
  override def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    decode(bytes) match {
      case None => if (bytes == null) Array.empty else bytes
      case Some(img) =>
        val sw = img.getWidth
        val sh = img.getHeight
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out.setRGB(x, y, img.getRGB(x * sw / w, y * sh / h) & 0xFFFFFF)
            x += 1
          }
          y += 1
        }
        encodePng(out)
    }

  /** REAL audio decode within JDK limits: `javax.sound.sampled` parses
    * RIFF/WAV containers and yields raw PCM — no external libraries.
    * 16-bit integer samples are decoded per the container's declared
    * endianness, then each FULL window reduces to
    * (mean-square energy, zero-crossing count). Both are INTEGER
    * arithmetic until one final exact division (Σ s² / windowSize —
    * dyadic for power-of-two windows, bit-equal in any engine), so the
    * oracle can replay a synthetic corpus from its generating formula.
    * Compressed codecs (MP3/AAC) need a deploy-time codec at this same
    * seam; undecodable/degenerate input yields no windows (total). */
  override def audioWindows(bytes: Array[Byte],
      windowSize: Int = 256): Seq[(Double, Long)] = {
    if (bytes == null || bytes.isEmpty || windowSize <= 0) return Seq.empty
    if (Mp4Codec.isMp4(bytes)) {
      // PCM-in-MP4 — the one standards-real MP4 AUDIO form the JDK
      // can decode (QuickTime/ISO uncompressed sample entries:
      // 'sowt' little-endian, 'twos' big-endian 16-bit): the audio
      // track's samples resolve through the same range machinery as
      // the MJPEG path, and their concatenation IS the raw PCM
      // stream — integer byte arithmetic, bit-exact on any JVM.
      // Compressed entries (mp4a/AAC) still need a deploy-time codec
      // at this seam: no windows (total), like any undecodable blob.
      val (info, payloads) = Mp4Codec.audioSamplePayloads(bytes)
      return info match {
        case Some(i) if (i.codec == "sowt" || i.codec == "twos") &&
            i.bits == 16 && i.channels == 1 =>
          val bos = new ByteArrayOutputStream()
          payloads.foreach(bos.write)
          pcmWindows(bos.toByteArray, big = i.codec == "twos",
            windowSize)
        case _ => Seq.empty
      }
    }
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      catch { case _: Exception => return Seq.empty }
    try {
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
        fmt.getEncoding !=
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return Seq.empty // only uncompressed 16-bit mono PCM here
      pcmWindows(in.readAllBytes(), fmt.isBigEndian, windowSize)
    } catch { case _: Exception => Seq.empty }
    finally in.close()
  }

  /** Window a raw 16-bit mono PCM byte stream into
    * (mean-square energy, zero-crossing count) per FULL window —
    * shared by the RIFF/WAV path (javax.sound hands us the stream)
    * and the PCM-in-MP4 path (the sample extractor does). */
  private def pcmWindows(data: Array[Byte], big: Boolean,
      windowSize: Int): Seq[(Double, Long)] = {
    val n = data.length / 2
    def sample(i: Int): Int = {
      val (b0, b1) = (data(2 * i), data(2 * i + 1))
      if (big) (b0.toInt << 8) | (b1 & 0xFF)
      else (b1.toInt << 8) | (b0 & 0xFF)
    }
    (0 until n / windowSize).map { w =>
      var sumSq = 0L
      var zc = 0L
      var j = w * windowSize
      var prev = 0
      val end = (w + 1) * windowSize
      while (j < end) {
        val s = sample(j)
        sumSq += s.toLong * s
        if (j > w * windowSize && prev * s < 0) zc += 1
        prev = s
        j += 1
      }
      (sumSq.toDouble / windowSize, zc)
    }
  }

  /** REAL frame extraction: a RIFF/AVI payload walks the hand-rolled
    * container parser ([[AviCodec]] — uncompressed-DIB frames decoded
    * with integer arithmetic, MJPEG frames through `ImageIO`'s real
    * JPEG reader); any other multi-frame payload goes to `ImageIO`'s
    * frame reader (animated GIF). Every `everyN`-th frame is kept and
    * re-encoded as PNG (lossless — the downstream per-frame decode
    * sees the exact pixels). Inter-frame codecs (MP4/H.264, WebM) need
    * JavaCV/ffmpeg at this same seam — the JDK has no decoder for
    * them. `frameSize` is the stub's chunk width; a real decoder's
    * frame dimensions come from the container, so it is ignored.
    * Undecodable/degenerate input yields no frames (total — one
    * corrupt blob must not kill a 100 TB stage). */
  override def sampleFrames(bytes: Array[Byte], everyN: Int,
      frameSize: Int = 64): Seq[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty || everyN <= 0) return Seq.empty
    if (AviCodec.isAvi(bytes))
      return AviCodec.sampleFrames(bytes, everyN).map(encodePng)
    if (Mp4Codec.isMp4(bytes)) {
      // MJPEG-in-MP4 — the one standards-real MP4 video form the JDK
      // can decode: resolve the video track's sample byte ranges
      // (stsz/stsc/stco→mdat, [[Mp4Codec.videoSamplePayloads]]) and
      // hand each extracted sample — a complete JPEG — to the same
      // ImageIO reader the AVI `##dc` path uses. Inter-frame codecs
      // (avc1/hvc1…) still need a deploy-time decoder: no frames here
      // (total), exactly like an AVI with an unknown compression.
      val (codec, payloads) = Mp4Codec.videoSamplePayloads(bytes)
      return codec match {
        // 'mjpb' (Motion JPEG B) is deliberately NOT accepted: its
        // samples carry no standard JPEG interchange markers, so
        // ImageIO.read can never decode one — listing it would only
        // promise frames the undecodable contract must return empty
        case Some(c) if c == "jpeg" || c == "mjpa" =>
          payloads.zipWithIndex.collect {
            case (p, i) if i % everyN == 0 =>
              try Option(ImageIO.read(new ByteArrayInputStream(p)))
              catch { case _: Exception => None } // corrupt sample ⇒ skip
          }.flatten.map(encodePng)
        case _ => Seq.empty
      }
    }
    val iis =
      try ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (iis == null) return Seq.empty
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Seq.empty
      val reader = readers.next()
      try {
        reader.setInput(iis) // in-memory stream: random access, so
        val n = reader.getNumImages(true) // allowSearch is cheap here
        (0 until n by everyN).flatMap { i =>
          try Option(encodePng(reader.read(i)))
          catch { case _: Exception => None } // corrupt frame ⇒ skipped
        }
      } finally reader.dispose()
    } catch { case _: Exception => Seq.empty }
    finally iis.close()
  }
}

object SyntheticImages {
  /** Corpus id selection for the MP4 fixture families. `modDen == 0`:
    * first-n prefix (`media_id < n`) — the spec-sized corpora.
    * `modDen > 0`: MODULAR selection (`media_id % modDen < n`), an
    * n/modDen fraction drawn uniformly across the id DOMAIN — the
    * judged-query mode, because key-shifted scale-ups
    * (tools/build_sf1.py offsets each copy's ids by i·1e8/1e10) leave
    * 9/10 of the ids outside any `< n` prefix: a prefix bound caps
    * fixture growth at the base copy (measured r12: the sf0.1→sf1
    * "decade" grew the corpus only 2.5×), while the modular fraction
    * grows exactly with the table at EVERY decade. The oracle twin is
    * the same `doc_id % modDen < n` predicate. */
  /** Fixture id rows, SPREAD across the session's cores: the documents
    * table ships as one parquet file at bench scale, so an id scan is
    * ONE partition and every `mapPartitions` fixture encoder — and the
    * decode pass consuming it — would otherwise run single-threaded on
    * a 32-core session ("partition-parallel" in the docstrings was
    * only true for multi-file lakes). A deterministic hash repartition
    * of the 8-byte id rows costs a trivial exchange and buys full
    * encode/decode parallelism (mm_mp4_frames ~2.7× at sf0.1); width
    * adapts to the session (defaultParallelism), not a constant.
    * Applied ONLY to the MODULAR corpora — they grow with the table at
    * every decade, so the decode work is real — never to the
    * constant-n spec fixtures, where 2-9 rows over 32 tasks is pure
    * scheduling overhead. */
  private def spreadIds(ids: DataFrame): DataFrame =
    ids.repartition(ids.sparkSession.sparkContext.defaultParallelism,
      col("media_id"))

  private def mp4Ids(spark: SparkSession, sfDir: String, n: Int,
      modDen: Int): DataFrame = {
    val ids = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"))
    if (modDen == 0) ids.filter(col("media_id") < n)
    else spreadIds(ids.filter(pmod(col("media_id"), lit(modDen)) < n))
  }

  /** Partition `n` samples into chunks of `spc` each plus a trailing
    * partial chunk — the layout shape shared by every MP4 corpus here
    * (the partial chunk is deliberate: it forces a multi-run stsc). */
  private def chunkLayout(n: Int, spc: Int): Seq[Int] =
    Seq.fill(n / spc)(spc) ++ (if (n % spc != 0) Seq(n % spc) else Nil)

  /** Procedural WAV corpus for judging the REAL audio path: one
    * 16-bit mono PCM WAV per document id below `n`, with
    * `512 + (id mod 3)·256` samples (always whole 256-windows) and
    * sample formula `((i·37 + id·101) mod 2003) − 1001` — bounded
    * amplitude, sign-alternating enough to exercise zero crossings.
    * The 44-byte RIFF header is hand-rolled (no encoder variance);
    * `javax.sound` must parse it back. The formula IS the oracle. */
  def wavTable(spark: SparkSession, sfDir: String, n: Int,
      sampleRate: Int = 8000): DataFrame = {
    val ids = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"))
      .filter(col("media_id") < n)
    val enc = ExpressionEncoder(
      RowEncoder.encoderFor(Multimodal.mediaSchema))
    ids.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val nSamples = (512 + (id % 3) * 256).toInt
        val dataSize = nSamples * 2
        val bos = new ByteArrayOutputStream(44 + dataSize)
        val o = new java.io.DataOutputStream(bos)
        o.writeBytes("RIFF"); o.writeInt(Integer.reverseBytes(36 + dataSize))
        o.writeBytes("WAVE"); o.writeBytes("fmt ")
        o.writeInt(Integer.reverseBytes(16))
        o.writeShort(java.lang.Short.reverseBytes(1.toShort).toInt) // PCM
        o.writeShort(java.lang.Short.reverseBytes(1.toShort).toInt) // mono
        o.writeInt(Integer.reverseBytes(sampleRate))
        o.writeInt(Integer.reverseBytes(sampleRate * 2))
        o.writeShort(java.lang.Short.reverseBytes(2.toShort).toInt)
        o.writeShort(java.lang.Short.reverseBytes(16.toShort).toInt)
        o.writeBytes("data"); o.writeInt(Integer.reverseBytes(dataSize))
        var i = 0
        while (i < nSamples) {
          val s = ((i.toLong * 37 + id * 101) % 2003 - 1001).toShort
          o.writeShort(java.lang.Short.reverseBytes(s).toInt)
          i += 1
        }
        Row(id, "audio", bos.toByteArray, "wav", null, null,
          nSamples * 1000L / sampleRate)
      }
    }(enc)
  }

  /** Procedural animated-GIF corpus for judging the REAL multi-frame
    * path: one `w`×`h` GIF per document id below `n`, with
    * `(id mod 4) + 2` frames and per-frame pixel luminance
    * `(7x + 13y + 31·id + 59·f) mod 256`. Frames are written
    * `TYPE_BYTE_INDEXED` over an explicit 256-entry gray palette, so
    * the GIF encoder quantizes NOTHING and decode is pixel-exact on any
    * JVM (verified: the default-palette path is lossy; this one
    * round-trips bit-equal). As with [[pngTable]], the formula IS the
    * oracle and binaries are born on executors, never shuffled. */
  def gifTable(spark: SparkSession, sfDir: String, n: Int,
      w: Int = 16, h: Int = 8): DataFrame = {
    val ids = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"))
      .filter(col("media_id") < n)
    val enc = ExpressionEncoder(
      RowEncoder.encoderFor(Multimodal.mediaSchema))
    ids.mapPartitions { it =>
      val ramp = Array.tabulate[Byte](256)(_.toByte)
      val gray = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
      it.map { row =>
        val id = row.getLong(0)
        val nFrames = (id % 4 + 2).toInt
        val bos = new ByteArrayOutputStream()
        val writer = ImageIO.getImageWritersByFormatName("gif").next()
        val ios = ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new BufferedImage(w, h,
            BufferedImage.TYPE_BYTE_INDEXED, gray)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.getRaster.setSample(x, y, 0,
                ((x * 7 + y * 13 + id * 31 + f * 59) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
            null)
          f += 1
        }
        writer.endWriteSequence()
        ios.close()
        writer.dispose()
        Row(id, "video", bos.toByteArray, "gif", w, h, nFrames * 40L)
      }
    }(enc)
  }

  /** Procedural AVI corpus for judging the REAL video-container path:
    * one `w`×`h` uncompressed-DIB AVI per document id below `n`, with
    * `(id mod 3) + 2` frames and per-frame pixel luminance
    * `(5x + 11y + 23·id + 47·f) mod 256` on all three channels. The
    * engine must walk an actual RIFF/AVI container
    * ([[AviCodec.framePayloads]]) and decode bottom-up BGR DIB rows;
    * DIB is integer-exact on any JVM, so — as with [[gifTable]] — the
    * formula IS the oracle and the compare is bit-strict. Binaries are
    * born on executors, never shuffled. */
  def aviTable(spark: SparkSession, sfDir: String, n: Int,
      w: Int = 16, h: Int = 8): DataFrame = {
    val ids = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"))
      .filter(col("media_id") < n)
    val enc = ExpressionEncoder(
      RowEncoder.encoderFor(Multimodal.mediaSchema))
    ids.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val nFrames = (id % 3 + 2).toInt
        val frames = (0 until nFrames).map { f =>
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val l = ((x * 5 + y * 11 + id * 23 + f * 47) % 256).toInt
              img.setRGB(x, y, (l << 16) | (l << 8) | l)
              x += 1
            }
            y += 1
          }
          img
        }
        Row(id, "video", AviCodec.muxDib(frames), "avi", w, h,
          nFrames * 40L)
      }
    }(enc)
  }

  /** Procedural MP4 corpus for judging the REAL container-metadata
    * path: one standards-shaped ISO-BMFF file per document id below
    * `n`, parameterized so every grammar branch in
    * [[Mp4Codec.parseMeta]] is exercised across the corpus —
    * FullBox version `id mod 2` (32- vs 64-bit time layouts),
    * timescale `600·(id mod 4 + 1)`, duration units
    * `timescale·(id mod 7 + 1) + id mod 97` (so duration_ms exercises
    * non-trivial floor division), dimensions `16·(id mod 5 + 1)` ×
    * `16·(id mod 3 + 1)` (written 16.16 fixed-point), video codec
    * fourcc cycling avc1/mp4v/hvc1, a second (audio, mp4a) track on
    * odd ids, and — on every 5th id — an `mdat` in the 64-bit
    * `largesize` escape form that the walker must skip to reach the
    * trailing `moov`. Every parameter is a pure formula of `id`, so
    * the formula IS the oracle: DuckDB recomputes the expected
    * metadata with integer arithmetic while the engine must walk the
    * actual bytes. Binaries are born on executors, never shuffled. */
  def mp4Table(spark: SparkSession, sfDir: String, n: Int,
      modDen: Int = 0): DataFrame = {
    val ids = mp4Ids(spark, sfDir, n, modDen)
    val enc = ExpressionEncoder(
      RowEncoder.encoderFor(Multimodal.mediaSchema))
    ids.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val ver = (id % 2).toInt
        val timescale = 600L * (id % 4 + 1)
        val duration = timescale * (id % 7 + 1) + id % 97
        val w = (16 * (id % 5 + 1)).toInt
        val h = (16 * (id % 3 + 1)).toInt
        val vcodec = Seq("avc1", "mp4v", "hvc1")((id % 3).toInt)
        val acodec = if (id % 2 == 1) Some("mp4a") else None
        // SAMPLE TABLES, every field a pure id formula so DuckDB can
        // replay per-track stats from the grammar the probe must walk:
        // n samples with sizes 50 + (id·31 + i·17) mod 211, stts in
        // TWO runs (first ⌊n/2⌋ at d1, rest at d1+50 — so fps is a
        // real duration-weighted quotient, not samples/constant), and
        // stss every (id mod 4 + 2)-th sample — ABSENT on id ≡ 0
        // (mod 6), the all-sync branch. Audio (odd ids): 10 fixed
        // 64-byte samples at delta 160, no stss, timescale 8000.
        val n = (8 * (id % 5 + 1)).toInt
        val d1 = (100 * (id % 3 + 1)).toInt
        val s = (id % 4 + 2).toInt
        val vTables = Mp4Codec.SampleTables(
          sizes = (0 until n).map(i =>
            (50 + (id * 31 + i * 17) % 211).toInt),
          sttsRuns = Seq((n / 2, d1), (n - n / 2, d1 + 50)),
          syncSamples = if (id % 6 == 0) None
          else Some((1 to n by s).toSeq))
        val aTables = Mp4Codec.SampleTables(
          sizes = Seq.fill(10)(64),
          sttsRuns = Seq((10, 160)),
          syncSamples = None)
        val bytes = Mp4Codec.mux("isom", ver, timescale, duration,
          w, h, vcodec, acodec, largeSizeMdat = id % 5 == 0,
          videoTables = Some(vTables), audioTables = Some(aTables),
          videoMediaTimescale = 600L * (id % 2 + 1),
          audioMediaTimescale = 8000L)
        Row(id, "video", bytes, "mp4", w, h,
          duration * 1000L / timescale)
      }
    }(enc)
  }

  /** Procedural MP4 corpus for judging SAMPLE-RANGE resolution
    * byte-exactly: each file's video samples are formula ASCII
    * payloads — sample `i` of media `id` is
    * `"S<id>:<i>:" + rep(chr(97 + (id+i) mod 26), 10 + (id·7 + i·13)
    * mod 37)` — muxed for real into `mdat` behind every branch of the
    * location grammar: chunks of `(id mod 3) + 1` samples (a trailing
    * partial chunk exercises multi-run `stsc`), `co64` on id ≡ 0
    * (mod 4) else `stco`, the 64-bit largesize `mdat` on id ≡ 0
    * (mod 5), and `(id mod 7)` junk bytes at the head of `mdat` that
    * offsets must skip. The engine must resolve
    * stsz/stsc/stco/co64 → exact byte ranges; DuckDB replays the
    * payload STRINGS from the formula — a hash-strict oracle over the
    * extracted bytes themselves. */
  def mp4AsciiTable(spark: SparkSession, sfDir: String,
      n: Int, modDen: Int = 0): DataFrame = {
    val ids = mp4Ids(spark, sfDir, n, modDen)
    val enc = ExpressionEncoder(
      RowEncoder.encoderFor(Multimodal.mediaSchema))
    ids.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val ns = (id % 4 + 3).toInt
        val payloads = (0 until ns).map { i =>
          val ch = ('a' + ((id + i) % 26)).toChar
          val rep = (10 + (id * 7 + i * 13) % 37).toInt
          (s"S$id:$i:" + ch.toString * rep).getBytes("US-ASCII")
        }
        val chunkSizes = chunkLayout(ns, (id % 3 + 1).toInt)
        val bytes = Mp4Codec.mux("isom", (id % 2).toInt, 600L,
          600L * ns, 16, 16, "mp4v", None,
          largeSizeMdat = id % 5 == 0,
          videoTables = Some(Mp4Codec.SampleTables(Nil,
            Seq((ns, 100)), None)),
          videoPayloads = Some(payloads),
          videoChunkSizes = chunkSizes,
          useCo64 = id % 4 == 0,
          mdatJunkPrefix = (id % 7).toInt)
        Row(id, "video", bytes, "mp4", 16, 16, ns * 40L)
      }
    }(enc)
  }

  /** Procedural PCM-in-MP4 corpus — the one standards-real MP4 AUDIO
    * form the JDK can decode, the audio twin of [[mjpegMp4Table]]:
    * one MP4 per document id below `n` whose audio track carries
    * `512 + (id mod 3)·256` 16-bit mono PCM frames (sample formula
    * `((i·37 + id·101) mod 2003) − 1001` — the SAME formula as
    * [[wavTable]], so the SAME integer-arithmetic oracle judges both
    * routes) split into MP4 samples of `100 + (id mod 7)·30` frames
    * (trailing partial sample), laid out in chunks of `(id mod 2)+1`
    * samples, `co64` on id ≡ 0 (mod 4), largesize `mdat` on id ≡ 0
    * (mod 6), junk-prefixed `mdat` (id mod 5 bytes). Endianness
    * alternates by parity — 'sowt' (little) on even ids, 'twos' (big)
    * on odd — so the decode must honor the sample-entry fourcc, not
    * assume one byte order. */
  def pcmMp4Table(spark: SparkSession, sfDir: String,
      n: Int, modDen: Int = 0): DataFrame = {
    val ids = mp4Ids(spark, sfDir, n, modDen)
    val enc = ExpressionEncoder(
      RowEncoder.encoderFor(Multimodal.mediaSchema))
    ids.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val nPcm = (512 + (id % 3) * 256).toInt
        val big = id % 2 == 1
        val codec = if (big) "twos" else "sowt"
        val pcm = new Array[Byte](nPcm * 2)
        var i = 0
        while (i < nPcm) {
          val s = ((i.toLong * 37 + id * 101) % 2003 - 1001).toShort
          if (big) {
            pcm(2 * i) = (s >> 8).toByte
            pcm(2 * i + 1) = (s & 0xFF).toByte
          } else {
            pcm(2 * i) = (s & 0xFF).toByte
            pcm(2 * i + 1) = (s >> 8).toByte
          }
          i += 1
        }
        val framesPerSample = (100 + (id % 7) * 30).toInt
        val payloads = pcm.grouped(framesPerSample * 2).toSeq
        val chunkSizes = chunkLayout(payloads.length, (id % 2 + 1).toInt)
        val mp4 = Mp4Codec.mux("isom", 0, 600L, nPcm.toLong, 16, 8,
          "mp4v", Some(codec), largeSizeMdat = id % 6 == 0,
          useCo64 = id % 4 == 0, mdatJunkPrefix = (id % 5).toInt,
          audioPayloads = Some(payloads), audioChunkSizes = chunkSizes,
          audioChannels = 1, audioSampleRate = 8000)
        Row(id, "audio", mp4, "mp4", null, null, nPcm * 1000L / 8000)
      }
    }(enc)
  }

  /** Inject a JPEG COM (comment) segment right after SOI: the bytes
    * change, the decoded pixels must NOT — the marker a real decoder
    * is obliged to skip. Used to plant byte-different/pixel-identical
    * duplicates. */
  def injectJpegComment(jpeg: Array[Byte]): Array[Byte] =
    jpeg.take(2) ++ Array(0xFF.toByte, 0xFE.toByte, 0x00.toByte,
      0x06.toByte, 'g'.toByte, 'r'.toByte, 'f'.toByte, 't'.toByte) ++
      jpeg.drop(2)

  /** Procedural MJPEG-in-MP4 corpus — the one standards-real MP4
    * video form the JDK can decode end-to-end: `(id mod 3) + 2` JPEG
    * frames per 64×32 file, each frame the BIT PATTERN of its unique
    * key `id·4 + f` painted as 8×8 blocks (bit b of the key drives
    * block `(x/8, y/8)`, b = x/8 + 8·(y/8): luminance 220 when set,
    * 35 when clear). The blocks align with JPEG's 8×8 DCT grid and
    * differ by 185 levels, so DISTINCT keys survive lossy
    * encode→decode as distinct pixels (an affine-gradient formula
    * does NOT: mod-256 wrap makes e.g. Δid = 15 a uniform −1 shift
    * that JPEG quantizes away — measured, 34 phantom groups), while
    * IDENTICAL keys give identical JPEG bytes. Muxed as real
    * `jpeg`-fourcc samples with location tables. Every 11th id is ALSO planted as a
    * byte-different / pixel-identical copy under `id + 1000000`: its
    * JPEG payloads carry an injected COM segment and the container
    * uses a different chunk layout AND offset form — so matching the
    * copy to its original requires resolving both layouts correctly
    * AND really decoding the JPEG samples (byte-grain dedup
    * structurally cannot match them). JPEG pixel output is not
    * bit-pinned ACROSS decoder libraries, so the judged query hashes
    * only the GROUP STRUCTURE (which (id, frame) pairs decode equal),
    * which the generating formula predicts exactly. */
  def mjpegMp4Table(spark: SparkSession, sfDir: String, n: Int,
      w: Int = 64, h: Int = 32, modDen: Int = 0): DataFrame = {
    val ids = mp4Ids(spark, sfDir, n, modDen)
    val enc = ExpressionEncoder(
      RowEncoder.encoderFor(Multimodal.mediaSchema))
    ids.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val nf = (id % 3 + 2).toInt
        val jpegs = (0 until nf).map { f =>
          val key = id * 4 + f // unique per (id, f)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val b = (x / 8) + 8 * (y / 8) // DCT-aligned block index
              val l = if (((key >> b) & 1L) == 1L) 220 else 35
              img.setRGB(x, y, (l << 16) | (l << 8) | l)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        def mk(pls: Seq[Array[Byte]], spc: Int,
            co64: Boolean): Array[Byte] = {
          val chunkSizes = chunkLayout(nf, spc)
          Mp4Codec.mux("isom", 0, 600L, nf * 100L, w, h, "jpeg", None,
            largeSizeMdat = false,
            videoTables = Some(Mp4Codec.SampleTables(Nil,
              Seq((nf, 100)), None)),
            videoPayloads = Some(pls),
            videoChunkSizes = chunkSizes, useCo64 = co64)
        }
        val base = Row(id, "video", mk(jpegs, 2, co64 = false), "mp4",
          w, h, nf * 40L)
        if (id % 11 == 0)
          Seq(base, Row(id + 1000000L, "video",
            mk(jpegs.map(injectJpegComment), 1, co64 = true), "mp4",
            w, h, nf * 40L))
        else Seq(base)
      }
    }(enc)
  }

  /** Procedural PNG corpus for judging the REAL decode path: one
    * `w`×`h` grayscale PNG per document id below `n`, pixel luminance
    * `(7x + 13y + 31·id) mod 256`. The formula IS the oracle — DuckDB
    * recomputes expected per-bucket pixel counts with pure integer
    * arithmetic over `generate_series`, no image library needed, while
    * the engine must round-trip REAL bytes through `ImageIO` encode →
    * decode to match. Encoded partition-parallel; binaries are born on
    * executors and never shuffle. */
  def pngTable(spark: SparkSession, sfDir: String, n: Int,
      w: Int = 32, h: Int = 16): DataFrame = {
    val ids = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"))
      .filter(col("media_id") < n)
    val enc = ExpressionEncoder(
      RowEncoder.encoderFor(Multimodal.mediaSchema))
    ids.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val l = ((x * 7 + y * 13 + id * 31) % 256).toInt
            img.setRGB(x, y, (l << 16) | (l << 8) | l)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray, "png", w, h, null)
      }
    }(enc)
  }
}
