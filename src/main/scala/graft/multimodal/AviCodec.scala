package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Hand-rolled RIFF/AVI container codec — the REAL video path within
  * JDK limits, retiring the last `StubCodec` modality. The reference
  * pipeline treats video as one opaque payload exploding into sampled
  * frames (`config/settings.py` media types; frame handling mirrors
  * the image path); here the CONTAINER walk is implemented for real:
  * RIFF chunk grammar (`'RIFF' size 'AVI '` → `LIST hdrl` with
  * `avih`/`strh`/`strf` headers → `LIST movi` with per-frame chunks),
  * the same RIFF family the WAV path already parses byte-by-byte
  * (`ImageIoCodec.audioWindows`).
  *
  * Two frame encodings — the two an AVI can carry without an external
  * codec library:
  *  - `##db` **uncompressed DIB** (BI_RGB, 24-bit, bottom-up BGR rows
  *    padded to 4 bytes): decoded here with integer arithmetic only —
  *    bit-exact on any JVM, so a formula oracle can judge end-to-end
  *    (`mm_video`).
  *  - `##dc` **MJPEG**: each chunk IS a complete JPEG; the walker hands
  *    the exact embedded bytes to `ImageIO`'s real JPEG reader. (JPEG
  *    decode is standards-correct but not bit-pinned across libjpeg
  *    variants, so MJPEG is spec-verified — container extraction is
  *    byte-exact, pixels equal `ImageIO.read` of the source JPEG — and
  *    the judged query uses the DIB form.)
  *
  * True inter-frame codecs (MP4/H.264, WebM/VP9) still need a
  * deploy-time decoder at the `MediaCodec` seam — the JDK has none.
  *
  * Totality: corrupt/truncated containers yield the frames that parsed
  * cleanly before the damage, never a throw — one bad blob must not
  * kill a 100 TB stage. Parsing is bounds-checked at every chunk.
  */
object AviCodec {

  /** Stream format from `strf` (BITMAPINFOHEADER). */
  final case class VideoMeta(width: Int, height: Int, bitCount: Int,
      compression: Int) // 0 = BI_RGB (DIB); 'MJPG' fourcc otherwise

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
  private def fcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fcc(bytes, 0) == "RIFF" && fcc(bytes, 8) == "AVI "

  /** Walk the container: stream format + the raw payload of every
    * video frame chunk in `movi` order, tagged compressed (`##dc`) or
    * not (`##db`). Payloads are the EXACT embedded bytes — for MJPEG
    * that byte-exactness is the walker's whole contract. */
  def framePayloads(bytes: Array[Byte])
      : (Option[VideoMeta], Seq[(Boolean, Array[Byte])]) = {
    if (!isAvi(bytes)) return (None, Seq.empty)
    var meta: Option[VideoMeta] = None
    val frames = Seq.newBuilder[(Boolean, Array[Byte])]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fcc(bytes, p)
        val size = le32(bytes, p + 4)
        if (size < 0 || p + 8 + size > end) return // truncated: stop
        if (id == "LIST" && size >= 4) {
          walk(p + 12, p + 8 + size) // skip the 4-byte list type
        } else if (id == "strf" && size >= 40 && meta.isEmpty) {
          meta = Some(VideoMeta(le32(bytes, p + 12), le32(bytes, p + 16),
            le16(bytes, p + 22), le32(bytes, p + 24)))
        } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("db") || id.endsWith("dc"))) {
          frames += ((id.endsWith("dc"),
            java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size)))
        }
        p += 8 + size + (size & 1) // chunks pad to even
      }
    }
    try walk(12, bytes.length)
    catch { case _: Exception => () } // corrupt grammar ⇒ what parsed
    (meta, frames.result())
  }

  /** Decode a 24-bit BI_RGB DIB payload (bottom-up BGR rows, 4-byte
    * row padding) — pure integer work, bit-exact everywhere. */
  private def decodeDib(payload: Array[Byte], w: Int,
      h: Int): Option[BufferedImage] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (w <= 0 || h <= 0 || payload.length < rowSize * h) return None
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val p = row + x * 3
        img.setRGB(x, y, ((payload(p + 2) & 0xFF) << 16) |
          ((payload(p + 1) & 0xFF) << 8) | (payload(p) & 0xFF))
        x += 1
      }
      y += 1
    }
    Some(img)
  }

  /** Every `everyN`-th frame of the container, decoded: DIB by the
    * integer path above, MJPEG through `ImageIO`'s JPEG reader.
    * Undecodable frames are skipped; unsupported DIB depths (≠ 24-bit)
    * yield nothing (total). */
  def sampleFrames(bytes: Array[Byte],
      everyN: Int): Seq[BufferedImage] = {
    if (everyN <= 0) return Seq.empty
    val (meta, payloads) = framePayloads(bytes)
    payloads.zipWithIndex.collect {
      case ((compressed, payload), i) if i % everyN == 0 =>
        if (compressed)
          try Option(ImageIO.read(new ByteArrayInputStream(payload)))
          catch { case _: Exception => None }
        else meta.filter(_.bitCount == 24).filter(_.compression == 0)
          .flatMap(m => decodeDib(payload, m.width, m.height))
    }.flatten
  }

  // ---- writers (fixtures/specs: procedural corpora need a muxer) ----

  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(8 + body.length + 1)
    out.write(id.getBytes("US-ASCII")); out.write(le32b(body.length))
    out.write(body)
    if ((body.length & 1) == 1) out.write(0) // even padding
    out.toByteArray
  }
  private def list(listType: String,
      children: Seq[Array[Byte]]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    body.write(listType.getBytes("US-ASCII"))
    children.foreach(body.write)
    chunk("LIST", body.toByteArray)
  }

  /** Encode one frame as a 24-bit bottom-up BGR DIB payload. */
  private def encodeDib(img: BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](rowSize * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(row + x * 3) = (rgb & 0xFF).toByte // B
        out(row + x * 3 + 1) = ((rgb >> 8) & 0xFF).toByte // G
        out(row + x * 3 + 2) = ((rgb >> 16) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Mux frame payloads into a minimal standards-shaped AVI: `hdrl`
    * (avih + one vids `strl` with `strh`/`strf`), `movi` with one
    * chunk per frame. `jpeg = true` writes `00dc`/MJPG, else
    * `00db`/BI_RGB. */
  private def mux(payloads: Seq[Array[Byte]], w: Int, h: Int,
      jpeg: Boolean, fps: Int): Array[Byte] = {
    val maxBuf = payloads.map(_.length).foldLeft(0)(math.max)
    val avih = new ByteArrayOutputStream()
    avih.write(le32b(1000000 / fps)) // dwMicroSecPerFrame
    avih.write(le32b(maxBuf * fps)) // dwMaxBytesPerSec
    avih.write(le32b(0)) // dwPaddingGranularity
    avih.write(le32b(0x10)) // dwFlags: AVIF_HASINDEX off, interleaved off
    avih.write(le32b(payloads.length)) // dwTotalFrames
    avih.write(le32b(0)) // dwInitialFrames
    avih.write(le32b(1)) // dwStreams
    avih.write(le32b(maxBuf)) // dwSuggestedBufferSize
    avih.write(le32b(w)); avih.write(le32b(h))
    (0 until 4).foreach(_ => avih.write(le32b(0))) // dwReserved
    val strh = new ByteArrayOutputStream()
    strh.write("vids".getBytes("US-ASCII"))
    strh.write((if (jpeg) "MJPG" else "DIB ").getBytes("US-ASCII"))
    strh.write(le32b(0)); strh.write(le16b(0)); strh.write(le16b(0))
    strh.write(le32b(0)) // dwInitialFrames
    strh.write(le32b(1)); strh.write(le32b(fps)) // dwScale / dwRate
    strh.write(le32b(0)) // dwStart
    strh.write(le32b(payloads.length)) // dwLength
    strh.write(le32b(maxBuf)) // dwSuggestedBufferSize
    strh.write(le32b(-1)) // dwQuality
    strh.write(le32b(0)) // dwSampleSize
    strh.write(le16b(0)); strh.write(le16b(0)) // rcFrame
    strh.write(le16b(w)); strh.write(le16b(h))
    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    strf.write(le32b(40)); strf.write(le32b(w)); strf.write(le32b(h))
    strf.write(le16b(1)); strf.write(le16b(24)) // planes / bpp
    strf.write(le32b(if (jpeg) le32("MJPG".getBytes("US-ASCII"), 0)
    else 0)) // biCompression
    strf.write(le32b(((w * 3 + 3) / 4) * 4 * h)) // biSizeImage
    strf.write(le32b(0)); strf.write(le32b(0))
    strf.write(le32b(0)); strf.write(le32b(0))
    val hdrl = list("hdrl", Seq(chunk("avih", avih.toByteArray),
      list("strl", Seq(chunk("strh", strh.toByteArray),
        chunk("strf", strf.toByteArray)))))
    val movi = list("movi",
      payloads.map(p => chunk(if (jpeg) "00dc" else "00db", p)))
    val body = new ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write(hdrl); body.write(movi)
    chunk("RIFF", body.toByteArray)
  }

  /** Mux images as an uncompressed-DIB AVI (bit-exact round trip). */
  def muxDib(frames: Seq[BufferedImage], fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    mux(frames.map(encodeDib), frames.head.getWidth,
      frames.head.getHeight, jpeg = false, fps = fps)
  }

  /** Mux ready-made JPEG payloads as an MJPEG AVI. */
  def muxMjpeg(jpegFrames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int = 25): Array[Byte] = {
    require(jpegFrames.nonEmpty, "an AVI needs at least one frame")
    mux(jpegFrames, w, h, jpeg = true, fps = fps)
  }
}
