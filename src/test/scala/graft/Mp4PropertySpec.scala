package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.multimodal.Mp4Codec

/** Property tests for the ISO-BMFF walker over generated containers:
  * mux→parse round-trips every metadata field for ARBITRARY parameter
  * combinations (both FullBox versions, any timescale/duration/dims,
  * any codec fourccs, largesize or plain mdat of any payload size),
  * and NO truncation point or mdat corruption of a valid container can
  * make the walker throw — totality, the 100 TB one-bad-blob contract.
  * Same direct-generator pattern as AviPropertySpec (the
  * scalatest/scalacheck bridge isn't in the offline cache). */
class Mp4PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 11L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  private case class Vid(ver: Int, timescale: Long, duration: Long,
      w: Int, h: Int, vcodec: String, acodec: Option[String],
      large: Boolean, mdatBytes: Int)

  private val fourcc: Gen[String] =
    Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)

  private val vidGen: Gen[Vid] = for {
    ver <- Gen.oneOf(0, 1)
    timescale <- Gen.choose(1L, 1000000L)
    // v0 stores duration in u32 — stay within it so both layouts agree
    duration <- Gen.choose(0L, 0xFFFFFFFFL)
    w <- Gen.choose(1, 0x7FFF) // 16.16 fixed: integer part is 16-bit
    h <- Gen.choose(1, 0x7FFF)
    vc <- fourcc
    ac <- Gen.option(fourcc)
    large <- Gen.oneOf(true, false)
    mdatBytes <- Gen.choose(0, 512)
  } yield Vid(ver, timescale, duration, w, h, vc, ac, large, mdatBytes)

  private def mux(v: Vid): Array[Byte] =
    Mp4Codec.mux("isom", v.ver, v.timescale, v.duration, v.w, v.h,
      v.vcodec, v.acodec, largeSizeMdat = v.large,
      mdatBytes = v.mdatBytes)

  test("mux→parse round-trips every field for arbitrary parameters") {
    for (v <- samples(vidGen, 60)) {
      val m = Mp4Codec.parseMeta(mux(v)).get
      val tag = s"v=$v"
      assert(m.brand == "isom", tag)
      assert(m.timescale == v.timescale, tag)
      assert(m.durationMs == v.duration * 1000L / v.timescale, tag)
      assert(m.nTracks == (if (v.acodec.isDefined) 2 else 1), tag)
      assert(m.width == v.w && m.height == v.h, tag)
      assert(m.videoCodec.contains(v.vcodec), tag)
      assert(m.audioCodec == v.acodec, tag)
    }
  }

  test("v0 and v1 layouts parse to the same metadata") {
    for (v <- samples(vidGen, 25, seed = 23L)) {
      val m0 = Mp4Codec.parseMeta(mux(v.copy(ver = 0)))
      val m1 = Mp4Codec.parseMeta(mux(v.copy(ver = 1)))
      assert(m0 == m1, s"v=$v")
    }
  }

  private case class Tables(sizes: Seq[Int], runs: Seq[(Int, Int)],
      sync: Option[Seq[Int]], mts: Long)

  private val tablesGen: Gen[Tables] = for {
    n <- Gen.choose(1, 40)
    sizes <- Gen.listOfN(n, Gen.choose(0, 100000))
    nRuns <- Gen.choose(1, 4)
    runs <- Gen.listOfN(nRuns,
      Gen.zip(Gen.choose(1, 50), Gen.choose(1, 10000)))
    sync <- Gen.option(Gen.choose(1, math.max(1, n))
      .map(s => (1 to n by s).toSeq))
    mts <- Gen.choose(1L, 100000L)
  } yield Tables(sizes, runs, sync, mts)

  test("sample tables: parseTracks recovers exact per-track sample " +
    "count, byte total, stts duration, sync count and the absent-stss " +
    "all-sync convention for arbitrary tables") {
    for ((v, t) <- samples(vidGen, 30, seed = 67L)
        .zip(samples(tablesGen, 30, seed = 91L))) {
      val st = Mp4Codec.SampleTables(t.sizes, t.runs,
        t.sync.map(_.toSeq))
      val bytes = Mp4Codec.mux("isom", v.ver, v.timescale, v.duration,
        v.w, v.h, v.vcodec, v.acodec, largeSizeMdat = v.large,
        mdatBytes = v.mdatBytes, videoTables = Some(st),
        videoMediaTimescale = t.mts)
      val tracks = Mp4Codec.parseTracks(bytes)
      assert(tracks.nonEmpty)
      val vt = tracks.find(_.handler == "vide").get
      val tag = s"t=$t"
      assert(vt.track == 1, tag)
      assert(vt.codec == v.vcodec, tag)
      assert(vt.mediaTimescale == t.mts, tag)
      assert(vt.nSamples == t.sizes.length.toLong, tag)
      assert(vt.totalBytes == t.sizes.map(_.toLong).sum, tag)
      assert(vt.durationUnits ==
        t.runs.map { case (c, d) => c.toLong * d }.sum, tag)
      assert(vt.hasStss == t.sync.isDefined, tag)
      assert(vt.nKeyframes ==
        t.sync.map(_.length.toLong).getOrElse(vt.nSamples), tag)
      // audio track (when present) carries no tables: zero facts, and
      // absent stss means all-sync (= nSamples = 0 here)
      tracks.find(_.handler == "soun").foreach { at =>
        assert(at.nSamples == 0 && !at.hasStss, tag)
      }
    }
  }

  test("sample tables: no truncation point of a table-carrying " +
    "container throws — a cut table yields what parsed") {
    val t = Tables(Seq.fill(20)(64), Seq((10, 100), (10, 150)),
      Some((1 to 20 by 3).toSeq), 600L)
    val st = Mp4Codec.SampleTables(t.sizes, t.runs, t.sync.map(_.toSeq))
    val full = Mp4Codec.mux("isom", 0, 600, 1200, 16, 16, "avc1",
      Some("mp4a"), largeSizeMdat = false, videoTables = Some(st),
      audioTables = Some(st))
    (0 until full.length).foreach { n =>
      Mp4Codec.parseTracks(java.util.Arrays.copyOf(full, n)) // no throw
    }
    ()
  }

  test("totality: no truncation point throws; mdat corruption is " +
    "metadata-invariant") {
    for (v <- samples(vidGen, 12, seed = 41L)) {
      val full = mux(v)
      val m = Mp4Codec.parseMeta(full)
      // every prefix parses without throwing
      (0 until full.length by math.max(1, full.length / 64)).foreach {
        n => Mp4Codec.parseMeta(java.util.Arrays.copyOf(full, n))
      }
      // flipping any byte strictly inside the mdat payload leaves the
      // metadata untouched — the probe never reads payload bytes
      if (v.mdatBytes > 0) {
        val at = full.indexOfSlice("mdat".getBytes("US-ASCII")) + 4 +
          (if (v.large) 8 else 0)
        val dirty = full.clone()
        dirty(at) = (dirty(at) ^ 0x5A).toByte
        assert(Mp4Codec.parseMeta(dirty) == m, s"v=$v")
      }
    }
  }

  test("adversarial sample tables saturate, never wrap negative: " +
    "u32·u32 products in stsz fixed-size and stts runs clamp to " +
    "Long.MaxValue") {
    // hand-rolled boxes: the muxer (correctly) can't emit these values
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
      be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
    }
    val u32max = 0xFFFFFFFFL
    // stsz fixed-size form: fixed = cnt = 2^32-1 → product ~1.8e19·…
    val stsz = box("stsz", be32(0L), be32(u32max), be32(u32max))
    // stts: two runs of count·delta = (2^32-1)² each — product AND
    // accumulation must both clamp
    val stts = box("stts", be32(0L), be32(2L),
      be32(u32max), be32(u32max), be32(u32max), be32(u32max))
    val hdlr = box("hdlr", be32(0L), be32(0L),
      "vide".getBytes("US-ASCII"), new Array[Byte](13))
    val trak = box("trak", box("mdia", hdlr,
      box("minf", box("stbl", stsz, stts))))
    val file = box("ftyp", "isom".getBytes("US-ASCII"), be32(0L),
      "isom".getBytes("US-ASCII")) ++ box("moov", trak)
    val tracks = Mp4Codec.parseTracks(file)
    assert(tracks.length == 1)
    val t = tracks.head
    assert(t.nSamples == u32max)
    assert(t.totalBytes == Long.MaxValue, s"wrapped: ${t.totalBytes}")
    assert(t.durationUnits == Long.MaxValue,
      s"wrapped: ${t.durationUnits}")
    assert(t.totalBytes >= 0 && t.durationUnits >= 0)
  }
}
