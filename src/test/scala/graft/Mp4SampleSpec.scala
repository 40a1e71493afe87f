package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage

import javax.imageio.ImageIO

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.multimodal.{ImageIoCodec, Mp4Codec, Multimodal,
  SyntheticImages}

/** MP4 SAMPLE extraction (`stsz`/`stsc`/`stco`/`co64` → `mdat` byte
  * ranges) and the MJPEG-in-MP4 decode path it unlocks — the last
  * codec-free leg of the container grammar:
  *
  *  - extraction is BYTE-EXACT under every layout branch: multi-run
  *    `stsc` (trailing partial chunk), `stco` vs `co64`, largesize
  *    `mdat`, junk bytes at the head of `mdat` that offsets must skip;
  *  - extracted `jpeg`-fourcc samples decode through the exact ImageIO
  *    path the AVI `##dc` chunks use, pixel-equal to decoding the
  *    source JPEG directly, COM-metadata-invariant, `everyN`-sampled;
  *  - totality: no truncation point throws and no resolved range ever
  *    escapes the file (property-tested over arbitrary layouts).
  */
class Mp4SampleSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 17L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def asciiPayloads(n: Int, salt: Int): Seq[Array[Byte]] =
    (0 until n).map(i =>
      (s"P$salt:$i:" + ("x" * (5 + (salt * 7 + i * 13) % 23)))
        .getBytes("US-ASCII"))

  private def mk(pls: Seq[Array[Byte]], chunkSizes: Seq[Int],
      co64: Boolean, large: Boolean, junk: Int): Array[Byte] =
    Mp4Codec.mux("isom", 0, 600L, 1200L, 16, 8, "mp4v", None,
      largeSizeMdat = large,
      videoTables = Some(Mp4Codec.SampleTables(Nil,
        Seq((pls.length, 100)), None)),
      videoPayloads = Some(pls), videoChunkSizes = chunkSizes,
      useCo64 = co64, mdatJunkPrefix = junk)

  test("extraction is byte-exact under every layout branch: multi-run " +
    "stsc, stco vs co64, largesize mdat, junk mdat prefix") {
    val pls = asciiPayloads(7, salt = 3)
    val layouts = Seq(
      (Seq(7), false, false, 0), // one chunk, stco
      (Seq(2, 2, 2, 1), false, false, 0), // trailing partial chunk
      (Seq(3, 3, 1), true, false, 5), // co64 + junk prefix
      (Seq(1, 1, 1, 1, 1, 1, 1), false, true, 11), // per-sample chunks, largesize
      (Seq(2, 2, 2, 1), true, true, 6))
    for ((cs, co64, large, junk) <- layouts) {
      val file = mk(pls, cs, co64, large, junk)
      val (codec, got) = Mp4Codec.videoSamplePayloads(file)
      val tag = s"cs=$cs co64=$co64 large=$large junk=$junk"
      assert(codec.contains("mp4v"), tag)
      assert(got.length == pls.length, tag)
      got.zip(pls).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), tag)
      }
    }
  }

  test("sampleRanges surfaces every track; a video track without " +
    "location tables yields no payloads (total, not a throw)") {
    // the legacy stats-only mux (no payloads): stsz/stts exist but no
    // stsc/stco — extraction must yield nothing, stats still work
    val noLoc = Mp4Codec.mux("isom", 0, 600L, 1200L, 16, 8, "mp4v",
      None, largeSizeMdat = false,
      videoTables = Some(Mp4Codec.SampleTables(Seq(10, 20, 30),
        Seq((3, 100)), None)))
    val (codec, pls) = Mp4Codec.videoSamplePayloads(noLoc)
    assert(codec.isEmpty && pls.isEmpty)
    assert(Mp4Codec.parseTracks(noLoc).head.nSamples == 3)
  }

  private def jpegOf(c: Int, w: Int = 16, h: Int = 8): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = (x * 5 + y * 9 + c) % 256
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def pixels(png: Array[Byte]): Seq[Int] = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y) & 0xFFFFFF
  }

  test("MJPEG-in-MP4 decodes through the exact ImageIO path: frames " +
    "pixel-equal direct decode of the source JPEGs, everyN honored") {
    val jpegs = (0 until 5).map(f => jpegOf(f * 37))
    val file = mk(jpegs, Seq(2, 2, 1), co64 = false, large = false,
      junk = 4)
    // mk uses fourcc mp4v — rebuild with the jpeg fourcc
    val jfile = Mp4Codec.mux("isom", 0, 600L, 1200L, 16, 8, "jpeg",
      None, largeSizeMdat = false,
      videoPayloads = Some(jpegs), videoChunkSizes = Seq(2, 2, 1),
      mdatJunkPrefix = 4)
    // non-decodable fourcc: no frames (the deploy-time-codec contract)
    assert(ImageIoCodec.sampleFrames(file, 1).isEmpty)
    val all = ImageIoCodec.sampleFrames(jfile, 1)
    assert(all.length == 5)
    all.zip(jpegs).foreach { case (png, src) =>
      assert(pixels(png) ==
        pixels({ // direct decode → PNG via the same normalization
          val direct = ImageIO.read(new ByteArrayInputStream(src))
          val bos = new ByteArrayOutputStream()
          ImageIO.write(direct, "png", bos)
          bos.toByteArray
        }))
    }
    assert(ImageIoCodec.sampleFrames(jfile, 2).length == 3) // 0,2,4
  }

  test("COM-segment injection changes the bytes, never the pixels — " +
    "the byte-different/pixel-identical duplicate the judged " +
    "mm_mp4_frames plants") {
    val j = jpegOf(42)
    val injected = SyntheticImages.injectJpegComment(j)
    assert(!java.util.Arrays.equals(j, injected))
    val a = Mp4Codec.mux("isom", 0, 600L, 300L, 16, 8, "jpeg", None,
      largeSizeMdat = false, videoPayloads = Some(Seq(j)))
    val b = Mp4Codec.mux("isom", 0, 600L, 300L, 16, 8, "jpeg", None,
      largeSizeMdat = false, videoPayloads = Some(Seq(injected)),
      useCo64 = true)
    val fa = ImageIoCodec.sampleFrames(a, 1)
    val fb = ImageIoCodec.sampleFrames(b, 1)
    assert(fa.length == 1 && fb.length == 1)
    // identical PNG BYTES — the digest grain the judged query groups on
    assert(java.util.Arrays.equals(fa.head, fb.head))
  }

  private case class Layout(n: Int, chunkSizes: Seq[Int], co64: Boolean,
      large: Boolean, junk: Int)

  private val layoutGen: Gen[Layout] = for {
    n <- Gen.choose(1, 12)
    spc <- Gen.choose(1, 5)
    co64 <- Gen.oneOf(true, false)
    large <- Gen.oneOf(true, false)
    junk <- Gen.choose(0, 16)
  } yield Layout(n,
    Seq.fill(n / spc)(spc) ++ (if (n % spc != 0) Seq(n % spc) else Nil),
    co64, large, junk)

  test("property: arbitrary layouts round-trip byte-exactly; NO " +
    "truncation point throws and no resolved range escapes the file") {
    for ((l, i) <- samples(layoutGen, 40).zipWithIndex) {
      val pls = asciiPayloads(l.n, salt = i)
      val file = mk(pls, l.chunkSizes, l.co64, l.large, l.junk)
      val (_, got) = Mp4Codec.videoSamplePayloads(file)
      assert(got.length == l.n, s"l=$l")
      got.zip(pls).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), s"l=$l")
      }
      (0 until file.length by math.max(1, file.length / 48)).foreach {
        cut =>
          val trunc = java.util.Arrays.copyOf(file, cut)
          // total: never throws; every surviving range stays in bounds
          Mp4Codec.sampleRanges(trunc).foreach(t =>
            t.ranges.foreach { case (off, len) =>
              assert(off >= 0 && len >= 0 && off + len <= cut,
                s"l=$l cut=$cut")
            })
      }
    }
  }

  private def pcm16(nFrames: Int, salt: Long,
      big: Boolean): Array[Byte] = {
    val out = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = ((i.toLong * 37 + salt * 101) % 2003 - 1001).toShort
      if (big) { out(2 * i) = (s >> 8).toByte
        out(2 * i + 1) = (s & 0xFF).toByte }
      else { out(2 * i) = (s & 0xFF).toByte
        out(2 * i + 1) = (s >> 8).toByte }
      i += 1
    }
    out
  }

  test("PCM-in-MP4 decodes to the same windows as the WAV route for " +
    "the same PCM, under BOTH endiannesses ('sowt' LE / 'twos' BE)") {
    for (big <- Seq(false, true)) {
      val nFrames = 768
      val raw = pcm16(nFrames, salt = 9L, big = big)
      val mp4 = Mp4Codec.mux("isom", 0, 600L, nFrames.toLong, 16, 8,
        "mp4v", Some(if (big) "twos" else "sowt"),
        largeSizeMdat = false, useCo64 = big, mdatJunkPrefix = 3,
        audioPayloads = Some(raw.grouped(250).toSeq),
        audioChunkSizes = Seq(2, 2, 2, 1), // 7 samples of ≤125 frames
        audioChannels = 1, audioSampleRate = 8000)
      // WAV route ground truth: hand-rolled RIFF header + same PCM
      // (javax.sound wants little-endian in plain RIFF; build LE and
      // decode — windows depend only on the decoded INT values, which
      // the formula fixes independent of byte order)
      val le = pcm16(nFrames, salt = 9L, big = false)
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      o.writeBytes("RIFF"); o.writeInt(Integer.reverseBytes(36 + le.length))
      o.writeBytes("WAVE"); o.writeBytes("fmt ")
      o.writeInt(Integer.reverseBytes(16))
      o.writeShort(java.lang.Short.reverseBytes(1.toShort).toInt)
      o.writeShort(java.lang.Short.reverseBytes(1.toShort).toInt)
      o.writeInt(Integer.reverseBytes(8000))
      o.writeInt(Integer.reverseBytes(16000))
      o.writeShort(java.lang.Short.reverseBytes(2.toShort).toInt)
      o.writeShort(java.lang.Short.reverseBytes(16.toShort).toInt)
      o.writeBytes("data"); o.writeInt(Integer.reverseBytes(le.length))
      o.write(le)
      val want = ImageIoCodec.audioWindows(bos.toByteArray)
      val got = ImageIoCodec.audioWindows(mp4)
      assert(want.nonEmpty && got == want, s"big=$big")
    }
  }

  test("compressed audio entries (mp4a) and non-mono PCM yield no " +
    "windows — the deploy-time-codec boundary at the audio seam") {
    val raw = pcm16(512, salt = 4L, big = false)
    val aac = Mp4Codec.mux("isom", 0, 600L, 512L, 16, 8, "mp4v",
      Some("mp4a"), largeSizeMdat = false,
      audioPayloads = Some(raw.grouped(256).toSeq),
      audioChannels = 1, audioSampleRate = 8000)
    assert(ImageIoCodec.audioWindows(aac).isEmpty)
    val stereo = Mp4Codec.mux("isom", 0, 600L, 512L, 16, 8, "mp4v",
      Some("sowt"), largeSizeMdat = false,
      audioPayloads = Some(raw.grouped(256).toSeq),
      audioChannels = 2, audioSampleRate = 8000)
    assert(ImageIoCodec.audioWindows(stereo).isEmpty)
  }

  test("adversarial location tables stay total and bounded: a co64 " +
    "offset near Long.MaxValue cannot wrap the bounds check, and a " +
    "u32-max fixed-size stsz with overlapping chunks caps at fileLen " +
    "ranges") {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(t: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
      be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
    }
    val hdlr = box("hdlr", be32(0L), be32(0L),
      "vide".getBytes("US-ASCII"), new Array[Byte](13))
    // (a) co64 offset at Long.MaxValue - 6 with sample size 20: the
    // additive form of the bounds check would wrap negative and pass
    val stsz1 = box("stsz", be32(0L), be32(20L), be32(1L))
    val stsc1 = box("stsc", be32(0L), be32(1L), be32(1L), be32(1L),
      be32(1L))
    val co64 = box("co64", be32(0L), be32(1L),
      be64(Long.MaxValue - 6L))
    val trak1 = box("trak", box("mdia", hdlr,
      box("minf", box("stbl", stsz1, stsc1, co64))))
    val f1 = box("ftyp", "isom".getBytes("US-ASCII"), be32(0L),
      "isom".getBytes("US-ASCII")) ++ box("moov", trak1)
    val (_, pls1) = Mp4Codec.videoSamplePayloads(f1) // must not throw
    assert(pls1.isEmpty)
    Mp4Codec.sampleRanges(f1).foreach(t =>
      t.ranges.foreach { case (off, len) =>
        assert(off >= 0 && len >= 0 && off + len <= f1.length)
      })
    // (b) fixed-size form claiming 2^32-1 one-byte samples over
    // overlapping chunks: the range builder must cap at fileLen, not
    // accumulate billions of tuples
    val stsz2 = box("stsz", be32(0L), be32(1L), be32(0xFFFFFFFFL))
    val stsc2 = box("stsc", be32(0L), be32(1L), be32(1L),
      be32(1000000L), be32(1L))
    val stco2 = box("stco", be32(0L), be32(64L),
      (0 until 64).toArray.flatMap(_ => be32(0L)))
    val trak2 = box("trak", box("mdia", hdlr,
      box("minf", box("stbl", stsz2, stsc2, stco2))))
    val f2 = box("ftyp", "isom".getBytes("US-ASCII"), be32(0L),
      "isom".getBytes("US-ASCII")) ++ box("moov", trak2)
    val ranges = Mp4Codec.sampleRanges(f2)
      .find(_.handler == "vide").map(_.ranges).getOrElse(Seq.empty)
    assert(ranges.length <= f2.length,
      s"${ranges.length} ranges from a ${f2.length}-byte file")
  }

  test("Spark probe stage: formula-ASCII corpus extracts the exact " +
    "strings (the judged mm_mp4_samples shape)") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.probeMp4Samples(
        SyntheticImages.mp4AsciiTable(spark, sf0001, n = 30))
      .orderBy(col("media_id"), col("sample_no")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, i) = (r.getLong(0), r.getInt(1))
      val ch = ('a' + ((id + i) % 26)).toChar
      val rep = (10 + (id * 7 + i * 13) % 37).toInt
      val want = s"S$id:$i:" + ch.toString * rep
      assert(r.getString(2) == want, s"id=$id i=$i")
      assert(r.getLong(3) == want.length.toLong)
    }
    // every id contributes exactly (id % 4) + 3 samples
    val perId = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    perId.foreach { case (id, n) => assert(n == (id % 4 + 3).toInt) }
  }
}
