package graft

import java.awt.image.BufferedImage

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.multimodal.AviCodec

/** Property tests for the RIFF/AVI codec over generated containers:
  * mux→walk→decode is pixel-exact for ANY dimensions (row padding
  * included), striding keeps exactly the 0, N, 2N... frames, and NO
  * truncation point of a valid container can make the walker throw —
  * every prefix yields the frames whose chunks survived intact
  * (totality, the 100 TB one-bad-blob contract). Same direct-generator
  * pattern as PropertySpec (the scalatest/scalacheck bridge isn't in
  * the offline cache). */
class AviPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  private case class Vid(w: Int, h: Int, frames: Seq[Array[Int]])

  private val vidGen: Gen[Vid] = for {
    w <- Gen.choose(1, 21) // odd widths exercise the 4-byte row padding
    h <- Gen.choose(1, 9)
    nf <- Gen.choose(1, 6)
    pixels <- Gen.listOfN(nf,
      Gen.listOfN(w * h, Gen.choose(0, 0xFFFFFF)).map(_.toArray))
  } yield Vid(w, h, pixels)

  private def img(v: Vid, f: Int): BufferedImage = {
    val out = new BufferedImage(v.w, v.h, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < v.w * v.h) {
      out.setRGB(i % v.w, i / v.w, v.frames(f)(i))
      i += 1
    }
    out
  }

  private def pixels(i: BufferedImage): Seq[Int] =
    for (y <- 0 until i.getHeight; x <- 0 until i.getWidth)
      yield i.getRGB(x, y) & 0xFFFFFF

  test("mux→walk→decode is pixel-exact for arbitrary dims and frames") {
    for (v <- samples(vidGen, 25)) {
      val avi = AviCodec.muxDib((0 until v.frames.length).map(img(v, _)))
      val back = AviCodec.sampleFrames(avi, everyN = 1)
      assert(back.length === v.frames.length, s"w=${v.w} h=${v.h}")
      back.zipWithIndex.foreach { case (b, f) =>
        assert(pixels(b) === v.frames(f).toSeq.map(_ & 0xFFFFFF),
          s"w=${v.w} h=${v.h} f=$f")
      }
    }
  }

  test("striding keeps exactly frames 0, N, 2N... for any N") {
    for (v <- samples(vidGen, 15); n <- 1 to 4) {
      val avi = AviCodec.muxDib((0 until v.frames.length).map(img(v, _)))
      val kept = AviCodec.sampleFrames(avi, everyN = n)
      val wantIdx = 0 until v.frames.length by n
      assert(kept.length === wantIdx.length, s"n=$n")
      kept.zip(wantIdx).foreach { case (b, f) =>
        assert(pixels(b) === v.frames(f).toSeq.map(_ & 0xFFFFFF))
      }
    }
  }

  test("every truncation point is total: clean-prefix frames only, " +
      "never a throw, never a corrupt frame") {
    for (v <- samples(vidGen, 8)) {
      val full = (0 until v.frames.length).map(img(v, _))
      val avi = AviCodec.muxDib(full)
      val fullPixels = full.map(pixels)
      // cut at a spread of points including chunk boundaries ±1
      val cuts = (0 to avi.length by math.max(1, avi.length / 23)) ++
        Seq(avi.length - 1, 11, 12, 13)
      for (cut <- cuts.filter(c => c >= 0 && c <= avi.length)) {
        val frames = AviCodec.sampleFrames(
          java.util.Arrays.copyOf(avi, cut), everyN = 1)
        // a decoded frame must be a PREFIX frame decoded exactly —
        // truncation may drop frames, never corrupt one
        assert(frames.length <= full.length)
        frames.zipWithIndex.foreach { case (b, f) =>
          assert(pixels(b) === fullPixels(f), s"cut=$cut f=$f")
        }
      }
    }
  }
}
