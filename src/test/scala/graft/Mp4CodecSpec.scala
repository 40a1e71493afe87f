package graft

import graft.multimodal.{Mp4Codec, Multimodal, SyntheticImages}

/** The hand-rolled ISO-BMFF (MP4) container walker ([[Mp4Codec]]) —
  * the metadata half of the one modality the JDK cannot sample-decode:
  *
  *  - mux → parse round-trips every field, under BOTH FullBox time
  *    layouts (version 0: 32-bit; version 1: 64-bit) and with the
  *    `mdat` in the 64-bit `largesize` escape form before the trailing
  *    `moov` (the layout real muxers emit — the probe must skip it by
  *    the 64-bit size, not the u32 sentinel);
  *  - multi-track files surface the FIRST video and FIRST audio
  *    sample-entry fourccs plus the track count;
  *  - totality: truncated / corrupt / non-MP4 bytes never throw —
  *    truncation yields what parsed before the damage, non-MP4 yields
  *    None;
  *  - the Spark probe stage ([[Multimodal.probeMp4Meta]]) carries the
  *    same values through the judged schema.
  */
class Mp4CodecSpec extends SparkSpec {

  private def mk(version: Int, large: Boolean,
      audio: Option[String] = Some("mp4a")): Array[Byte] =
    Mp4Codec.mux("isom", version, timescale = 1200L, duration = 3005L,
      w = 64, h = 32, videoCodec = "avc1", audioCodec = audio,
      largeSizeMdat = large)

  test("v0 round-trip: every metadata field recovered from the bytes") {
    val m = Mp4Codec.parseMeta(mk(0, large = false)).get
    assert(m.brand == "isom")
    assert(m.timescale == 1200L)
    assert(m.durationMs == 3005L * 1000 / 1200) // floor, 2504
    assert(m.nTracks == 2)
    assert(m.width == 64 && m.height == 32)
    assert(m.videoCodec.contains("avc1"))
    assert(m.audioCodec.contains("mp4a"))
  }

  test("v1 (64-bit times) layout parses identically") {
    val m0 = Mp4Codec.parseMeta(mk(0, large = false)).get
    val m1 = Mp4Codec.parseMeta(mk(1, large = false)).get
    assert(m0 == m1)
  }

  test("largesize mdat before the trailing moov is skipped correctly") {
    val m = Mp4Codec.parseMeta(mk(1, large = true)).get
    assert(m.brand == "isom" && m.nTracks == 2 && m.width == 64)
  }

  test("video-only file: one track, no audio codec") {
    val m = Mp4Codec.parseMeta(mk(0, large = false, audio = None)).get
    assert(m.nTracks == 1 && m.audioCodec.isEmpty)
    assert(m.videoCodec.contains("avc1"))
  }

  test("totality: truncation at every prefix length never throws") {
    val full = mk(1, large = true)
    // every prefix parses to SOMETHING (or None) without throwing;
    // a prefix that still contains the whole moov parses fully
    (0 to full.length by 7).foreach { n =>
      Mp4Codec.parseMeta(java.util.Arrays.copyOf(full, n))
    }
    val m = Mp4Codec.parseMeta(full).get
    // flipping bytes inside mdat must not change the metadata
    val dirty = full.clone()
    val mdatAt = full.indexOfSlice("mdat".getBytes("US-ASCII"))
    dirty(mdatAt + 20) = 0x5A
    assert(Mp4Codec.parseMeta(dirty).get == m)
  }

  test("adversarial: 100k-deep container nesting cannot overflow the " +
    "stack; huge/negative v1 durations saturate instead of wrapping") {
    // hand-built blob: ftyp, then 100k nested 'moov' headers, each box
    // claiming exactly the remaining bytes — without the depth cap the
    // walker recursed once per level and died with StackOverflowError
    // (an Error, invisible to the Exception catch)
    def be32(v: Int): Array[Byte] = Array((v >> 24).toByte,
      (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val n = 100000
    val bos = new java.io.ByteArrayOutputStream(16 + 8 * n)
    bos.write(be32(16)); bos.write("ftyp".getBytes("US-ASCII"))
    bos.write("isom".getBytes("US-ASCII")); bos.write(be32(512))
    (0 until n).foreach { i =>
      bos.write(be32(8 * (n - i))); bos.write("moov".getBytes("US-ASCII"))
    }
    val m = Mp4Codec.parseMeta(bos.toByteArray) // must not throw
    assert(m.isDefined && m.get.brand == "isom")
    // v1 duration large enough that duration*1000 would wrap negative
    val big = Mp4Codec.parseMeta(Mp4Codec.mux("isom", 1,
      timescale = 1200L, duration = Long.MaxValue / 2, w = 8, h = 8,
      videoCodec = "avc1", audioCodec = None,
      largeSizeMdat = false)).get
    assert(big.durationMs == Long.MaxValue / 2 / 1200L * 1000L)
    assert(big.durationMs > 0)
    // all-ones duration reads negative (>= 2^63 unsigned) → saturate
    val neg = Mp4Codec.parseMeta(Mp4Codec.mux("isom", 1,
      timescale = 1200L, duration = -1L, w = 8, h = 8,
      videoCodec = "avc1", audioCodec = None,
      largeSizeMdat = false)).get
    assert(neg.durationMs == Long.MaxValue)
  }

  test("non-MP4 bytes yield None, null yields None") {
    assert(Mp4Codec.parseMeta("RIFF....AVI LIST".getBytes).isEmpty)
    assert(Mp4Codec.parseMeta(Array.emptyByteArray).isEmpty)
    assert(Mp4Codec.parseMeta(null).isEmpty)
  }

  test("Spark probe stage carries the formula fields end-to-end") {
    val out = Multimodal
      .probeMp4Meta(SyntheticImages.mp4Table(spark, sf0001, n = 40))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 40)
    (0L until 40L).foreach { id =>
      val r = out(id)
      assert(r.getString(1) == "isom")
      val ts = 600L * (id % 4 + 1)
      assert(r.getLong(2) == ts)
      assert(r.getLong(3) == (ts * (id % 7 + 1) + id % 97) * 1000 / ts)
      assert(r.getInt(4) == (id % 2 + 1).toInt)
      assert(r.getInt(5) == (16 * (id % 5 + 1)).toInt)
      assert(r.getInt(6) == (16 * (id % 3 + 1)).toInt)
      assert(r.getString(7) == Seq("avc1", "mp4v", "hvc1")((id % 3).toInt))
      assert((r.getString(8) == null) == (id % 2 == 0))
    }
  }
}
