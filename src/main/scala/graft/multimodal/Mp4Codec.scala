package graft.multimodal

import java.io.ByteArrayOutputStream

/** Hand-rolled ISO-BMFF (MP4) container walker — the metadata half of
  * the one modality the JDK cannot decode. The reference treats video
  * as an opaque payload with typed metadata alongside
  * (`config/settings.py` media types); H.264/AAC SAMPLE decode needs a
  * deploy-time codec at the `MediaCodec` seam, but the CONTAINER
  * grammar is pure byte arithmetic, and a 100 TB curation pass wants
  * exactly this probe: duration / dimensions / codec fourcc / track
  * layout read from the first few KB of each blob, no decoder, no
  * shuffle of the binary itself.
  *
  * Grammar implemented (ISO/IEC 14496-12): `size(u32 BE) type(4cc)`
  * box headers with the two escape forms — `size == 1` ⇒ 64-bit
  * `largesize` follows the type; `size == 0` ⇒ box runs to end of
  * enclosure — recursion into the container boxes on the metadata
  * path (`moov`, `trak`, `mdia`, `minf`, `stbl`), and both version 0
  * (32-bit times) and version 1 (64-bit times) layouts of the
  * `mvhd`/`tkhd` FullBoxes. `tkhd` width/height are 16.16 fixed-point.
  * Codec identity is the first sample-entry fourcc inside each
  * track's `stsd`.
  *
  * Totality: corrupt/truncated containers yield whatever metadata
  * parsed cleanly before the damage, never a throw — one bad blob
  * must not kill a 100 TB stage. Every box is bounds-checked against
  * its enclosure before recursion.
  */
object Mp4Codec {

  /** Container-level metadata: everything a curation pass filters on
    * without decoding a single sample. */
  final case class Mp4Meta(
      brand: String, // ftyp major_brand
      timescale: Long, // mvhd movie timescale (units/second)
      durationMs: Long, // mvhd duration, floor-converted to ms
      nTracks: Int, // number of trak boxes
      width: Int, // first video track, 16.16 → integer part
      height: Int,
      videoCodec: Option[String], // first video stsd entry fourcc
      audioCodec: Option[String]) // first audio stsd entry fourcc

  private def beU32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
      ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
  private def be64(b: Array[Byte], p: Int): Long =
    (beU32(b, p) << 32) | beU32(b, p + 4)
  private def fcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** An ISO-BMFF file begins with an `ftyp` box (size ≥ 16: header +
    * major_brand + minor_version). */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 16 && fcc(bytes, 4) == "ftyp"

  // Saturating arithmetic for sample-table accumulation: the operands
  // are unsigned-32 reads (each up to ~4.3e9), so products like
  // stsz fixed·count or stts count·delta can exceed Long.MaxValue on
  // adversarial input and wrap NEGATIVE — a parser documented as total
  // over corrupt input must clamp, not emit garbage-negative
  // total_bytes/duration that flips downstream bitrate/fps signs.
  private def satMul(a: Long, b: Long): Long =
    try Math.multiplyExact(a, b)
    catch { case _: ArithmeticException => Long.MaxValue }
  private def satAdd(a: Long, b: Long): Long =
    try Math.addExact(a, b)
    catch { case _: ArithmeticException => Long.MaxValue }

  /** Per-track SAMPLE-TABLE statistics — what a 100 TB video curation
    * pass actually filters on (per-track fps, bitrate, keyframe
    * density), still pure byte arithmetic over `stsz`/`stts`/`stss`,
    * no codec anywhere. Integer facts only; the ratio columns (fps =
    * samples·timescale/duration, bitrate = 8·bytes·timescale/duration,
    * keyframe density) are derived downstream so both engines round
    * the same doubles. Per 14496-12, an ABSENT `stss` means every
    * sample is a sync sample — `nKeyframes` then equals `nSamples`
    * and `hasStss` records the distinction. */
  final case class TrackStats(
      track: Int, // 1-based position of the trak box in file order
      handler: String, // 'vide' / 'soun' / …
      codec: String, // first stsd sample-entry fourcc
      mediaTimescale: Long, // mdhd timescale (units/second)
      nSamples: Long, // stsz sample_count
      durationUnits: Long, // Σ stts count·delta, in mdhd units
      totalBytes: Long, // Σ stsz sizes (fixed-size form: size·count)
      nKeyframes: Long, // stss entry_count, or nSamples when absent
      hasStss: Boolean)

  // per-track accumulator while walking one `trak` subtree
  private final class TrakState {
    var handler: String = ""
    var w: Int = 0
    var h: Int = 0
    var codec: String = ""
    var mdhdTimescale: Long = 0L
    var nSamples: Long = 0L
    var durationUnits: Long = 0L
    var totalBytes: Long = 0L
    var stssCount: Long = 0L
    var hasStss: Boolean = false
    // sample-LOCATION tables (stsz sizes + stsc runs + stco/co64
    // offsets): everything [[sampleRanges]] needs to resolve each
    // sample to its exact `mdat` byte range. All buffers are bounded
    // by the enclosing box's byte length (the parse loops stop at
    // qEnd), so adversarial entry counts cannot balloon memory.
    var stszFixed: Long = 0L
    val sampleSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stscRuns = // (first_chunk, samples_per_chunk), 1-based chunks
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val chunkOffs = scala.collection.mutable.ArrayBuffer.empty[Long]
    // AudioSampleEntry fields (soun tracks): what a PCM decode needs
    var entryChannels: Int = 0
    var entryBits: Int = 0
    var entrySampleRate: Long = 0L
  }

  /** Everything needed to resolve one track's samples into file byte
    * ranges, captured verbatim from its tables. */
  private final case class RawTrack(track: Int, handler: String,
      codec: String, fixedSize: Long, nSamples: Long,
      sizes: IndexedSeq[Long], stsc: IndexedSeq[(Long, Long)],
      offsets: IndexedSeq[Long], channels: Int, bits: Int,
      sampleRate: Long)

  /** Walk the container and collect movie-level metadata. Returns
    * `None` only when the bytes are not ISO-BMFF at all. Location
    * tables are NOT buffered on this path (`needRanges = false`): a
    * metadata probe over a real MP4 with millions of samples stays an
    * O(1)-memory walk. */
  def parseMeta(bytes: Array[Byte]): Option[Mp4Meta] =
    parseAll(bytes, needRanges = false).map(_._1)

  /** Per-track sample-table statistics ([[TrackStats]]), in file
    * order. Empty when the bytes are not ISO-BMFF (or carry no trak
    * boxes) — total on corrupt input like [[parseMeta]], and like it
    * an O(1)-memory walk (stats need sums, never per-sample tables). */
  def parseTracks(bytes: Array[Byte]): Seq[TrackStats] =
    parseAll(bytes, needRanges = false).map(_._2).getOrElse(Seq.empty)

  /** One track's resolved per-sample byte ranges: `(offset, size)`
    * into the ORIGINAL file bytes, in sample order. */
  final case class TrackRanges(track: Int, handler: String,
      codec: String, ranges: Seq[(Long, Int)])

  /** Resolve every track's samples to exact file byte ranges via
    * `stsz` (sizes) + `stsc` (sample→chunk runs) + `stco`/`co64`
    * (chunk offsets) — the last leg of the container grammar: with it
    * the walker can hand a codec the exact embedded sample payloads
    * (MJPEG-in-MP4: each video sample IS a complete JPEG). Total on
    * corrupt input: a range that escapes the file bounds ends that
    * track's resolution at the samples that resolved cleanly. */
  def sampleRanges(bytes: Array[Byte]): Seq[TrackRanges] =
    parseAll(bytes, needRanges = true)
      .map(_._3.map(r => TrackRanges(r.track, r.handler,
        r.codec, resolveRanges(r, bytes.length.toLong))))
      .getOrElse(Seq.empty)

  /** The first video track's codec fourcc and its EXTRACTED sample
    * payloads, in sample order — the MJPEG-in-MP4 decode path hands
    * each payload to the JPEG reader exactly as [[AviCodec]] hands
    * `##dc` chunk bytes to it. Empty for non-MP4 bytes or a video
    * track without location tables. */
  def videoSamplePayloads(
      bytes: Array[Byte]): (Option[String], Seq[Array[Byte]]) =
    parseAll(bytes, needRanges = true) match {
      case None => (None, Seq.empty)
      case Some((_, _, raws)) =>
        // resolve ONLY the selected track: a sibling audio track's
        // (possibly huge) location tables must not be walked just to
        // be discarded
        raws.find(r => r.handler == "vide" && r.offsets.nonEmpty &&
          r.stsc.nonEmpty) match {
          case None => (None, Seq.empty)
          case Some(r) =>
            val ranges = resolveRanges(r, bytes.length.toLong)
            if (ranges.isEmpty) (None, Seq.empty)
            else (Some(r.codec).filter(_.nonEmpty),
              ranges.map { case (off, len) =>
                java.util.Arrays.copyOfRange(bytes, off.toInt,
                  off.toInt + len)
              })
        }
    }

  /** First audio track's sample-entry PCM facts (channels / bits /
    * sample rate from the AudioSampleEntry) — what the PCM-in-MP4
    * ('sowt' little-endian / 'twos' big-endian) decode path needs. */
  final case class PcmInfo(codec: String, channels: Int, bits: Int,
      sampleRate: Long)

  /** The first audio ('soun') track's codec + PCM facts + extracted
    * sample payloads — the audio twin of [[videoSamplePayloads]]:
    * for the uncompressed sample entries ('sowt'/'twos') the
    * concatenated payloads ARE the raw PCM stream, decodable with
    * integer byte arithmetic and no codec library. */
  def audioSamplePayloads(
      bytes: Array[Byte]): (Option[PcmInfo], Seq[Array[Byte]]) = {
    parseAll(bytes, needRanges = true) match {
      case None => (None, Seq.empty)
      case Some((_, _, raws)) =>
        raws.find(r => r.handler == "soun" && r.offsets.nonEmpty &&
          r.stsc.nonEmpty) match {
          case None => (None, Seq.empty)
          case Some(r) =>
            val ranges = resolveRanges(r, bytes.length.toLong)
            if (ranges.isEmpty) (None, Seq.empty)
            else (Some(PcmInfo(r.codec, r.channels, r.bits,
              r.sampleRate)),
              ranges.map { case (off, len) =>
                java.util.Arrays.copyOfRange(bytes, off.toInt,
                  off.toInt + len)
              })
        }
    }
  }


  /** Walk `stsc` runs against `stco` chunk offsets, laying samples
    * head-to-tail within each chunk per their `stsz` sizes (ISO/IEC
    * 14496-12 §8.7.4-5). Bounds-checked per sample: the first range
    * that escapes the file ends the resolution with the clean prefix
    * (totality — one corrupt blob must not kill a 100 TB stage). */
  private def resolveRanges(r: RawTrack,
      fileLen: Long): Seq[(Long, Int)] = {
    if (r.offsets.isEmpty || r.stsc.isEmpty) return Seq.empty
    val runs = r.stsc.filter(t => t._1 >= 1L && t._2 >= 1L)
      .sortBy(_._1)
    if (runs.isEmpty) return Seq.empty
    // emitted-range bound: the table form is capped by the parsed
    // sizes (≤ box bytes / 4); the FIXED-size form's count is a bare
    // u32 a corrupt file can set to 4.29e9 with overlapping chunk
    // offsets, so cap it at fileLen — a valid layout cannot hold more
    // ≥1-byte samples than the file has bytes, and the builder then
    // stays proportional to the input instead of OOMing an executor
    // off a 1 MB blob
    val nSized =
      if (r.fixedSize != 0L) math.min(r.nSamples, fileLen)
      else math.min(r.nSamples, r.sizes.length.toLong)
    val out = Seq.newBuilder[(Long, Int)]
    // cumulative-payload budget: overlapping chunk offsets in a
    // corrupt table can make every individual range pass the bounds
    // check while their TOTAL dwarfs the file (each emitted tuple is
    // ~40 boxed bytes, a ~40× amplification over the input). A valid
    // non-overlapping layout's payload sum cannot exceed fileLen, so
    // stop at the clean prefix once the emitted bytes would.
    var emitted = 0L
    var s = 0L // next sample index
    var runIdx = 0
    var c = 0 // chunk index (0-based over stco entries)
    while (c < r.offsets.length && s < nSized) {
      val chunkNo = c + 1L
      while (runIdx + 1 < runs.length && runs(runIdx + 1)._1 <= chunkNo)
        runIdx += 1
      val spc =
        if (runs(runIdx)._1 <= chunkNo) runs(runIdx)._2 else 0L
      var off = r.offsets(c)
      var j = 0L
      while (j < spc && s < nSized) {
        val size =
          if (r.fixedSize != 0L) r.fixedSize else r.sizes(s.toInt)
        // subtraction form: `off + size > fileLen` overflows Long for
        // a corrupt co64 offset near Long.MaxValue and would let the
        // wrapped-negative sum pass the guard straight into
        // copyOfRange — size ≤ Int.MaxValue makes fileLen - size safe
        if (off < 0 || size < 0 || size > Int.MaxValue.toLong ||
          off > fileLen - size) return out.result() // corrupt: prefix
        emitted += size
        if (emitted > fileLen) return out.result() // overlap: prefix
        out += ((off, size.toInt))
        off += size; s += 1; j += 1
      }
      c += 1
    }
    out.result()
  }

  /** `needRanges` gates the per-sample LOCATION buffers (stsz table
    * sizes, stsc runs, stco/co64 offsets): the stats/meta probes pass
    * false and keep the old O(1)-memory walk — a real MP4 with
    * millions of samples must not pay millions of boxed appends per
    * row on paths that never resolve ranges. */
  private def parseAll(bytes: Array[Byte], needRanges: Boolean)
      : Option[(Mp4Meta, Seq[TrackStats], Seq[RawTrack])] = {
    if (!isMp4(bytes)) return None
    val tracks = scala.collection.mutable.ArrayBuffer.empty[TrackStats]
    val rawTracks = scala.collection.mutable.ArrayBuffer.empty[RawTrack]
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var nTracks = 0
    var width = 0
    var height = 0
    var videoCodec: Option[String] = None
    var audioCodec: Option[String] = None

    // Containers the metadata path recurses into; everything else
    // (mdat, free, udta…) is skipped by size — the whole point of a
    // header probe: O(metadata), not O(payload).
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")

    // depth cap: the metadata path nests ≤ 5 containers in a valid
    // file (moov/trak/mdia/minf/stbl); a corrupt blob advertising
    // thousands of nested containers would otherwise recurse to a
    // StackOverflowError — an Error, NOT caught by the Exception
    // handler below — and kill the task (the one-bad-blob failure
    // this walker's totality contract forbids)
    def walk(start: Int, end: Int, trak: TrakState, depth: Int): Unit = {
      if (depth > 16) return
      var p = start
      while (p + 8 <= end) {
        val size32 = beU32(bytes, p)
        val typ = fcc(bytes, p + 4)
        var hdr = 8
        var size = size32
        if (size32 == 1L) { // 64-bit largesize escape
          if (p + 16 > end) return
          size = be64(bytes, p + 8); hdr = 16
        } else if (size32 == 0L) { // runs to end of enclosure
          size = (end - p).toLong
        }
        if (size < hdr || p + size > end) return // truncated: stop
        val q = p + hdr // payload start
        val qEnd = (p + size).toInt
        typ match {
          case "ftyp" if q + 4 <= qEnd && brand.isEmpty =>
            brand = fcc(bytes, q)
          case "mvhd" if q + 4 <= qEnd =>
            val v = bytes(q) & 0xFF // FullBox: version(1) flags(3)
            if (v == 1 && q + 32 <= qEnd) {
              timescale = beU32(bytes, q + 20) // after 8+8 byte times
              duration = be64(bytes, q + 24)
            } else if (v == 0 && q + 20 <= qEnd) {
              timescale = beU32(bytes, q + 12) // after 4+4 byte times
              duration = beU32(bytes, q + 16)
            }
          case "trak" =>
            nTracks += 1
            val t = new TrakState
            walk(q, qEnd, t, depth + 1)
            if (t.handler == "vide" && videoCodec.isEmpty) {
              videoCodec = Some(t.codec).filter(_.nonEmpty)
              width = t.w; height = t.h
            } else if (t.handler == "soun" && audioCodec.isEmpty) {
              audioCodec = Some(t.codec).filter(_.nonEmpty)
            }
            tracks += TrackStats(nTracks, t.handler, t.codec,
              t.mdhdTimescale, t.nSamples, t.durationUnits,
              t.totalBytes,
              if (t.hasStss) t.stssCount else t.nSamples, t.hasStss)
            rawTracks += RawTrack(nTracks, t.handler, t.codec,
              t.stszFixed, t.nSamples, t.sampleSizes.toIndexedSeq,
              t.stscRuns.toIndexedSeq, t.chunkOffs.toIndexedSeq,
              t.entryChannels, t.entryBits, t.entrySampleRate)
          case "tkhd" if trak != null && q + 4 <= qEnd =>
            val v = bytes(q) & 0xFF
            // FullBox payload → width offset: verflags(4) + times/ids
            // (v0: 4+4+4+4+4 = 20; v1: 8+8+4+4+8 = 32) + reserved(8) +
            // layer/group/volume/reserved(8) + matrix(36)
            val off = q + 4 + (if (v == 1) 32 else 20) + 8 + 8 + 36
            if (off + 8 <= qEnd) {
              trak.w = (beU32(bytes, off) >>> 16).toInt // 16.16 fixed
              trak.h = (beU32(bytes, off + 4) >>> 16).toInt
            }
          case "hdlr" if trak != null && q + 12 <= qEnd =>
            trak.handler = fcc(bytes, q + 8) // verflags(4) predefined(4)
          case "stsd" if trak != null && q + 16 <= qEnd =>
            // verflags(4) entry_count(4), then first sample entry:
            // size(4) format(4cc) — the codec identity
            if (beU32(bytes, q + 4) >= 1) {
              trak.codec = fcc(bytes, q + 12)
              // AudioSampleEntry layout (14496-12 §12.2.3), offsets
              // within the entry: reserved(6)+dref(2)+reserved(8) →
              // channelcount@24(2) samplesize@26(2) pre/res(4) →
              // samplerate@32 (16.16). Read when present — a PCM
              // ('sowt'/'twos') decode needs all three; harmless for
              // video entries (overwritten semantics never used).
              val e = q + 8 // first sample entry start
              if (e + 36 <= qEnd) {
                trak.entryChannels =
                  (((bytes(e + 24) & 0xFF) << 8) |
                    (bytes(e + 25) & 0xFF))
                trak.entryBits =
                  (((bytes(e + 26) & 0xFF) << 8) |
                    (bytes(e + 27) & 0xFF))
                trak.entrySampleRate = beU32(bytes, e + 32) >>> 16
              }
            }
          case "mdhd" if trak != null && q + 4 <= qEnd =>
            // media timescale: same v0/v1 time layouts as mvhd
            val v = bytes(q) & 0xFF
            if (v == 1 && q + 24 <= qEnd)
              trak.mdhdTimescale = beU32(bytes, q + 20)
            else if (v == 0 && q + 16 <= qEnd)
              trak.mdhdTimescale = beU32(bytes, q + 12)
          case "stsz" if trak != null && q + 12 <= qEnd =>
            // verflags(4) sample_size(4) sample_count(4); size == 0 ⇒
            // per-sample u32 table follows, else fixed-size form
            val fixed = beU32(bytes, q + 4)
            val cnt = beU32(bytes, q + 8)
            trak.nSamples = cnt
            trak.stszFixed = fixed
            if (fixed != 0L) trak.totalBytes = satMul(fixed, cnt)
            else {
              var i = 0L
              var tot = 0L
              var o = q + 12
              while (i < cnt && o + 4 <= qEnd) {
                val sz = beU32(bytes, o)
                tot = satAdd(tot, sz)
                if (needRanges) trak.sampleSizes += sz
                o += 4; i += 1
              }
              trak.totalBytes = tot // truncated table: what parsed
            }
          case "stts" if trak != null && q + 8 <= qEnd =>
            // verflags(4) entry_count(4), entries × (count, delta):
            // duration = Σ count·delta in mdhd units
            val entries = beU32(bytes, q + 4)
            var i = 0L
            var dur = 0L
            var o = q + 8
            while (i < entries && o + 8 <= qEnd) {
              dur = satAdd(dur, satMul(beU32(bytes, o), beU32(bytes, o + 4)))
              o += 8; i += 1
            }
            trak.durationUnits = dur
          case "stsc" if trak != null && q + 8 <= qEnd =>
            // sample-to-chunk runs: verflags(4) entry_count(4),
            // entries × (first_chunk, samples_per_chunk, sdi) — sdi
            // (sample description index) is irrelevant to ranges
            val entries = beU32(bytes, q + 4)
            var i = 0L
            var o = q + 8
            while (needRanges && i < entries && o + 12 <= qEnd) {
              trak.stscRuns += ((beU32(bytes, o), beU32(bytes, o + 4)))
              o += 12; i += 1
            }
          case "stco" if trak != null && q + 8 <= qEnd =>
            // 32-bit chunk offsets (absolute file positions)
            val entries = beU32(bytes, q + 4)
            var i = 0L
            var o = q + 8
            while (needRanges && i < entries && o + 4 <= qEnd) {
              trak.chunkOffs += beU32(bytes, o); o += 4; i += 1
            }
          case "co64" if trak != null && q + 8 <= qEnd =>
            // 64-bit chunk offsets — the > 4 GiB file form
            val entries = beU32(bytes, q + 4)
            var i = 0L
            var o = q + 8
            while (needRanges && i < entries && o + 8 <= qEnd) {
              trak.chunkOffs += be64(bytes, o); o += 8; i += 1
            }
          case "stss" if trak != null && q + 8 <= qEnd =>
            // sync-sample table: only the entry COUNT matters for
            // keyframe density; absence means all-sync (handled at
            // the trak fold)
            trak.hasStss = true
            trak.stssCount = beU32(bytes, q + 4)
          case t0 if containers(t0) =>
            walk(q, qEnd, trak, depth + 1)
          case _ => () // mdat/free/…: skip by size
        }
        p = (p + size).toInt
      }
    }
    try walk(0, bytes.length, null, 0)
    catch { case _: Exception => () } // corrupt grammar ⇒ what parsed
    // saturating ms conversion: ISO durations are UNSIGNED 64-bit, so
    // a corrupt v1 value can read negative here, and `duration * 1000`
    // can wrap for anything ≥ 2^63/1000 — either way a curation gate
    // would see a garbage negative. Saturate instead of wrapping
    // (sub-ms precision is irrelevant at these magnitudes).
    val durationMs =
      if (timescale <= 0) 0L
      else if (duration < 0) Long.MaxValue // ≥ 2^63 unsigned: garbage-huge
      else if (duration > Long.MaxValue / 1000L) {
        val q = duration / timescale
        if (q > Long.MaxValue / 1000L) Long.MaxValue else q * 1000L
      } else duration * 1000L / timescale
    Some((Mp4Meta(brand, timescale, durationMs,
      nTracks, width, height, videoCodec, audioCodec), tracks.toSeq,
      rawTracks.toSeq))
  }

  // ---- writer (fixtures/specs: procedural corpora need a muxer) ----

  private def be16b(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32b(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64b(v: Long): Array[Byte] =
    be32b(v >>> 32) ++ be32b(v & 0xFFFFFFFFL)

  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    be32b(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
  }
  private def fullBox(typ: String, version: Int,
      parts: Array[Byte]*): Array[Byte] =
    box(typ, (Array((version & 0xFF).toByte, 0.toByte, 0.toByte,
      0.toByte) +: parts): _*)

  /** `mdat` in the 64-bit `largesize` escape form — header probe must
    * skip it correctly to reach a trailing `moov`. */
  private def largeMdat(payload: Array[Byte]): Array[Byte] =
    be32b(1L) ++ "mdat".getBytes("US-ASCII") ++
      be64b(16L + payload.length) ++ payload

  private def visualSampleEntry(codec: String, w: Int,
      h: Int): Array[Byte] = {
    // VisualSampleEntry (14496-12 §12.1.3): 6 reserved + data_ref(2) +
    // pre_defined/reserved(16) + width(2) height(2) + 72dpi res(8) +
    // reserved(4) + frame_count(2) + compressorname(32) + depth(2) +
    // pre_defined(2)
    box(codec,
      new Array[Byte](6), be16b(1),
      new Array[Byte](16),
      be16b(w), be16b(h),
      be32b(0x00480000L), be32b(0x00480000L),
      be32b(0L), be16b(1),
      new Array[Byte](32),
      be16b(24), be16b(0xFFFF))
  }
  private def audioSampleEntry(codec: String, sampleRate: Int,
      channels: Int = 2): Array[Byte] =
    // AudioSampleEntry: 6 reserved + data_ref(2) + reserved(8) +
    // channelcount(2) + samplesize(2) + pre_defined(2) + reserved(2) +
    // samplerate(16.16)
    box(codec, new Array[Byte](6), be16b(1), new Array[Byte](8),
      be16b(channels), be16b(16), be16b(0), be16b(0),
      be32b(sampleRate.toLong << 16))

  /** Sample-table content for the muxer: per-sample sizes (`stsz`
    * table form), time-to-sample runs (`stts` (count, delta) pairs),
    * and optionally the sync-sample numbers (`stss`; None = box
    * absent = every sample is sync). */
  final case class SampleTables(sizes: Seq[Int],
      sttsRuns: Seq[(Int, Int)], syncSamples: Option[Seq[Int]])

  private def sampleBoxes(t: SampleTables): Array[Byte] = {
    val stsz = fullBox("stsz", 0, be32b(0L),
      be32b(t.sizes.length.toLong),
      t.sizes.toArray.flatMap(s => be32b(s.toLong)))
    val stts = fullBox("stts", 0, be32b(t.sttsRuns.length.toLong),
      t.sttsRuns.toArray.flatMap { case (c, d) =>
        be32b(c.toLong) ++ be32b(d.toLong)
      })
    val stss = t.syncSamples.map(ss => fullBox("stss", 0,
      be32b(ss.length.toLong),
      ss.toArray.flatMap(n => be32b(n.toLong))))
      .getOrElse(Array.emptyByteArray)
    stsz ++ stts ++ stss
  }

  private def trak(version: Int, trackId: Long, duration: Long,
      handler: String, w: Int, h: Int,
      sampleEntry: Array[Byte],
      mediaTimescale: Long = 600L,
      samples: Option[SampleTables] = None,
      chunkBoxes: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val tkhd =
      if (version == 1)
        fullBox("tkhd", 1, be64b(0L), be64b(0L), be32b(trackId),
          be32b(0L), be64b(duration), new Array[Byte](8),
          be16b(0), be16b(0), be16b(if (handler == "soun") 0x0100 else 0),
          be16b(0), identityMatrix,
          be32b(w.toLong << 16), be32b(h.toLong << 16))
      else
        fullBox("tkhd", 0, be32b(0L), be32b(0L), be32b(trackId),
          be32b(0L), be32b(duration), new Array[Byte](8),
          be16b(0), be16b(0), be16b(if (handler == "soun") 0x0100 else 0),
          be16b(0), identityMatrix,
          be32b(w.toLong << 16), be32b(h.toLong << 16))
    val mdhd =
      if (version == 1)
        fullBox("mdhd", 1, be64b(0L), be64b(0L), be32b(mediaTimescale),
          be64b(duration), be16b(0x55C4), be16b(0)) // 'und' language
      else
        fullBox("mdhd", 0, be32b(0L), be32b(0L), be32b(mediaTimescale),
          be32b(duration), be16b(0x55C4), be16b(0))
    val hdlr = fullBox("hdlr", 0, be32b(0L),
      handler.getBytes("US-ASCII"), new Array[Byte](12),
      Array(0.toByte)) // null-terminated empty name
    val stsd = fullBox("stsd", 0, be32b(1L), sampleEntry)
    val stbl = box("stbl",
      stsd ++ samples.map(sampleBoxes).getOrElse(Array.emptyByteArray)
        ++ chunkBoxes)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    box("trak", tkhd, mdia)
  }

  private val identityMatrix: Array[Byte] =
    be32b(0x00010000L) ++ be32b(0L) ++ be32b(0L) ++
      be32b(0L) ++ be32b(0x00010000L) ++ be32b(0L) ++
      be32b(0L) ++ be32b(0L) ++ be32b(0x40000000L)

  /** Mux a minimal standards-shaped MP4: `ftyp` + `free` + `mdat`
    * (optionally in the 64-bit largesize form — the probe must skip
    * it to reach the TRAILING `moov`, the layout real muxers emit) +
    * `moov` with `mvhd` and one or two `trak`s. `version` selects the
    * 32- vs 64-bit FullBox time layouts end-to-end.
    *
    * `videoPayloads` turns the mux into a REAL media writer: the
    * payloads become the `mdat` body (after `mdatJunkPrefix` junk
    * bytes — offsets must point past them), laid out in chunks of
    * `videoChunkSizes` samples each (default: one chunk), with the
    * video track gaining the location tables — `stsz` sizes from the
    * payload lengths, `stsc` runs RLE-compressed from the chunk
    * layout, and chunk offsets as `co64` when `useCo64` else `stco`.
    * [[sampleRanges]] must resolve them back to the exact bytes. */
  def mux(brand: String, version: Int, timescale: Long, duration: Long,
      w: Int, h: Int, videoCodec: String,
      audioCodec: Option[String], largeSizeMdat: Boolean,
      mdatBytes: Int = 64,
      videoTables: Option[SampleTables] = None,
      audioTables: Option[SampleTables] = None,
      videoMediaTimescale: Long = 600L,
      audioMediaTimescale: Long = 600L,
      videoPayloads: Option[Seq[Array[Byte]]] = None,
      videoChunkSizes: Seq[Int] = Nil,
      useCo64: Boolean = false,
      mdatJunkPrefix: Int = 0,
      audioPayloads: Option[Seq[Array[Byte]]] = None,
      audioChunkSizes: Seq[Int] = Nil,
      audioChannels: Int = 2,
      audioSampleRate: Int = 8000): Array[Byte] = {
    val ftyp = box("ftyp", brand.getBytes("US-ASCII"), be32b(512L),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))
    val free = box("free", new Array[Byte](12))
    val anyPayloads = videoPayloads.isDefined || audioPayloads.isDefined
    val junk = Array.tabulate[Byte](
      if (anyPayloads) mdatJunkPrefix else 0)(i => (i * 3 + 1).toByte)
    val vPls = videoPayloads.getOrElse(Seq.empty)
    val aPls = audioPayloads.getOrElse(Seq.empty)
    val payload =
      if (anyPayloads)
        junk ++ (vPls ++ aPls).foldLeft(Array.emptyByteArray)(_ ++ _)
      else Array.tabulate[Byte](mdatBytes)(i => (i * 7).toByte)
    val mdat =
      if (largeSizeMdat) largeMdat(payload) else box("mdat", payload)
    // per-track location boxes (stsc + stco/co64) — offsets are
    // ABSOLUTE file positions, known here because mdat precedes the
    // trailing moov; audio samples are laid out AFTER the video block
    def locBoxes(pls: Seq[Array[Byte]], wantChunks: Seq[Int],
        base: Long, tables: Option[SampleTables])
        : (Array[Byte], Option[SampleTables]) = {
      val chunkSizes =
        if (wantChunks.nonEmpty) wantChunks else Seq(pls.length)
      require(chunkSizes.sum == pls.length && chunkSizes.forall(_ > 0),
        s"chunk layout ${chunkSizes.mkString(",")} must partition " +
          s"${pls.length} samples")
      val offsets = chunkSizes.scanLeft((base, 0)) {
        case ((off, idx), cs) =>
          (off + pls.slice(idx, idx + cs).map(_.length.toLong).sum,
            idx + cs)
      }.map(_._1).dropRight(1)
      // RLE-compress equal consecutive samples-per-chunk into stsc
      // runs (first_chunk, samples_per_chunk, sdi=1)
      val runs = chunkSizes.zipWithIndex.foldLeft(
        List.empty[(Int, Int)]) { case (acc, (cs, i)) =>
        acc match {
          case (_, prev) :: _ if prev == cs => acc
          case _ => (i + 1, cs) :: acc
        }
      }.reverse
      val stsc = fullBox("stsc", 0, be32b(runs.length.toLong),
        runs.toArray.flatMap { case (first, spc) =>
          be32b(first.toLong) ++ be32b(spc.toLong) ++ be32b(1L)
        })
      val cBox =
        if (useCo64) fullBox("co64", 0, be32b(offsets.length.toLong),
          offsets.toArray.flatMap(be64b))
        else fullBox("stco", 0, be32b(offsets.length.toLong),
          offsets.toArray.flatMap(be32b))
      val sized = tables
        .map(t => t.copy(sizes = pls.map(_.length)))
        .orElse(Some(SampleTables(pls.map(_.length),
          Seq((pls.length, 100)), None)))
      (stsc ++ cBox, sized)
    }
    val mdatBase = ftyp.length.toLong + free.length +
      (if (largeSizeMdat) 16 else 8) + junk.length
    val (vChunkBoxes, vSizedTables) =
      if (videoPayloads.isDefined)
        locBoxes(vPls, videoChunkSizes, mdatBase, videoTables)
      else (Array.emptyByteArray, videoTables)
    val (aChunkBoxes, aSizedTables) =
      if (audioPayloads.isDefined)
        locBoxes(aPls, audioChunkSizes,
          mdatBase + vPls.map(_.length.toLong).sum, audioTables)
      else (Array.emptyByteArray, audioTables)
    val mvhd =
      if (version == 1)
        fullBox("mvhd", 1, be64b(0L), be64b(0L), be32b(timescale),
          be64b(duration), be32b(0x00010000L), be16b(0x0100),
          new Array[Byte](10), identityMatrix, new Array[Byte](24),
          be32b(3L)) // next_track_ID
      else
        fullBox("mvhd", 0, be32b(0L), be32b(0L), be32b(timescale),
          be32b(duration), be32b(0x00010000L), be16b(0x0100),
          new Array[Byte](10), identityMatrix, new Array[Byte](24),
          be32b(3L))
    val vtrak = trak(version, 1L, duration, "vide", w, h,
      visualSampleEntry(videoCodec, w, h), videoMediaTimescale,
      vSizedTables, vChunkBoxes)
    val traks = audioCodec match {
      case Some(ac) =>
        vtrak ++ trak(version, 2L, duration, "soun", 0, 0,
          audioSampleEntry(ac, audioSampleRate, audioChannels),
          audioMediaTimescale, aSizedTables, aChunkBoxes)
      case None => vtrak
    }
    val moov = box("moov", mvhd, traks)
    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(free); out.write(mdat); out.write(moov)
    out.toByteArray
  }
}
