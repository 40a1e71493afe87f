package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.MediaCodec

/** A REAL image codec behind the [[Multimodal.MediaCodec]] seam, built
  * entirely on the JDK (`javax.imageio` — no external libraries, so it
  * runs in this sandbox): PNG/BMP/GIF decode, deterministic
  * nearest-neighbor resize, and luminance-histogram pixel features.
  * Video stays on [[Multimodal.StubCodec]] — the JDK has no video
  * decoder, and the seam exists precisely so each modality can swap
  * independently.
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
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
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

  /** The JDK decodes no video containers; frames stay on the stub path
    * until a JavaCV/ffmpeg codec swaps in at this same seam. */
  override def sampleFrames(bytes: Array[Byte], everyN: Int,
      frameSize: Int = 64): Seq[Array[Byte]] =
    Multimodal.StubCodec.sampleFrames(bytes, everyN, frameSize)
}

object SyntheticImages {
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
