package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trips for the three JDK-only codecs: ANY parameters
  * in the supported envelope must encode → sniff/decode back exactly
  * (the XlsRoundTripSpec pattern applied to media). Deterministic
  * seeds, writer-independent assertions.
  */
class CodecRoundTripSpec extends AnyFunSuite {

  private def forAllN[A](g: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("property: PNG encode → sniff + decode round-trips dims and gray exactly") {
    val gen = for {
      w <- Gen.choose(1, 120); h <- Gen.choose(1, 80); g <- Gen.choose(0, 255)
    } yield (w, h, g)
    forAllN(gen, 120) { case (w, h, g) =>
      val bytes = ImageCodec.encodePng(w, h, g)
      assert(ImageCodec.sniff(bytes).contains(("png", w, h)))
      assert(ImageCodec.decodeStats(bytes).contains((w, h, g)))
    }
  }

  test("property: WAV encode → sniff + decode round-trips format and amplitude") {
    val gen = for {
      n <- Gen.choose(1, 400); rate <- Gen.choose(8000, 48000)
      amp <- Gen.choose(0, 32767); hp <- Gen.choose(1, 60)
    } yield (n, rate, amp, hp)
    forAllN(gen, 120) { case (n, rate, amp, hp) =>
      val bytes = AudioCodec.encodePcm16(n, rate, amp, hp)
      assert(AudioCodec.sniff(bytes).contains(("pcm", rate, 1, 16, n.toLong)))
      val Some((ns, peak, mean)) = AudioCodec.decodeStats(bytes)
      assert(ns == n && peak == amp / 32768.0 && mean == amp / 32768.0)
    }
  }

  test("property: AVI encode → sniff + frame extraction round-trips structure") {
    val gen = for {
      w <- Gen.choose(4, 48); h <- Gen.choose(4, 32); nf <- Gen.choose(1, 10)
      fps <- Gen.oneOf(10, 15, 20, 25); g <- Gen.choose(0, 255)
    } yield (w, h, nf, fps, g)
    forAllN(gen, 40) { case (w, h, nf, fps, g) =>
      val bytes = VideoCodec.encodeMjpegAvi(w, h, nf, fps, g)
      assert(VideoCodec.sniff(bytes).contains(("mjpeg", w, h, nf, fps)))
      val fs = VideoCodec.frames(bytes)
      assert(fs.length == nf)
      assert(fs.forall(f => ImageCodec.sniff(f).contains(("jpeg", w, h))))
      // sampling invariant: every k yields ceil(nf/k) frames
      (1 to nf).foreach { k =>
        assert(VideoCodec.sampleFrames(bytes, k).length == (nf + k - 1) / k)
      }
    }
  }

  test("property: corrupt RIFF chunk lengths terminate the walk (no hang, no throw)") {
    // flipping a chunk-length field to 0xFFFFFFFF used to drive the
    // cursor BACKWARDS after toInt truncation — an infinite loop on
    // hostile input. Every mutated payload must return (any result)
    // promptly.
    val wav = AudioCodec.encodePcm16(64, 8000, 500, 8)
    val avi = VideoCodec.encodeMjpegAvi(8, 8, 3, 10, 50)
    val gen = Gen.choose(4, math.min(wav.length, avi.length) - 5)
    forAllN(gen, 60) { pos =>
      val w = wav.clone; val a = avi.clone
      (0 until 4).foreach { j => w(pos + j) = 0xff.toByte; a(pos + j) = 0xff.toByte }
      AudioCodec.sniff(w); AudioCodec.decodeStats(w)
      VideoCodec.sniff(a); VideoCodec.frames(a)
      ImageCodec.sniff(w) // cross-feeding corrupted payloads is also safe
    }
  }

  test("property: the three sniffers are mutually exclusive on each other's output") {
    val gen = for {
      a <- Gen.choose(2, 24); b <- Gen.choose(2, 24); g <- Gen.choose(0, 255)
    } yield (a, b, g)
    forAllN(gen, 40) { case (a, b, g) =>
      val png = ImageCodec.encodePng(a, b, g)
      val wav = AudioCodec.encodePcm16(a * b, 8000, g * 100 % 32768, 5)
      val avi = VideoCodec.encodeMjpegAvi(a + 3, b + 3, 2, 10, g)
      assert(AudioCodec.sniff(png).isEmpty && VideoCodec.sniff(png).isEmpty)
      assert(ImageCodec.sniff(wav).isEmpty && VideoCodec.sniff(wav).isEmpty)
      assert(ImageCodec.sniff(avi).isEmpty && AudioCodec.sniff(avi).isEmpty)
    }
  }
}
