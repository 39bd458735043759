package graft.multimodal

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip proofs that the audio path is real: bytes we encode are
  * decoded by an INDEPENDENT reader (`javax.sound.sampled` reads our
  * hand-rolled WAV and must report identical format and samples), and
  * our header sniffer reads AudioSystem-written WAV output.
  */
class AudioCodecSpec extends AnyFunSuite {

  test("hand-rolled WAV sniffs to its own parameters") {
    for ((n, rate, amp) <- Seq((50, 8000, 0), (250, 44100, 32767), (128, 16000, 12345))) {
      val bytes = AudioCodec.encodePcm16(n, rate, amp, 25)
      assert(AudioCodec.sniff(bytes).contains(("pcm", rate, 1, 16, n.toLong)))
    }
  }

  test("square-wave stats are exactly amp/32768 for peak AND mean") {
    for (amp <- Seq(0, 1, 7, 16384, 32767)) {
      val bytes = AudioCodec.encodePcm16(200, 8000, amp, 25)
      val Some((n, peak, mean)) = AudioCodec.decodeStats(bytes)
      assert(n == 200)
      assert(peak == amp / 32768.0, s"peak for amp $amp")
      assert(mean == amp / 32768.0, s"mean for amp $amp")
    }
  }

  test("javax.sound.sampled parity: independent JDK reader agrees on format and samples") {
    val bytes = AudioCodec.encodePcm16(100, 22050, 1000, 10)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 22050f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == 100)
    // decode the raw frames via AudioSystem and recompute the stats —
    // must match our byte-walk decode exactly
    val raw = in.readAllBytes()
    assert(raw.length == 200)
    var peak = 0.0; var sum = 0.0
    var i = 0
    while (i + 1 < raw.length) {
      val v = ((raw(i) & 0xff) | (raw(i + 1) << 8)).toShort
      val a = math.abs(v.toDouble) / 32768.0
      if (a > peak) peak = a
      sum += a
      i += 2
    }
    val Some((n, p2, m2)) = AudioCodec.decodeStats(bytes)
    assert(n == 100 && p2 == peak && m2 == sum / 100)
  }

  test("sniff reads AudioSystem-written WAV (independent encoder)") {
    val samples = Array.tabulate[Byte](400) { i => (if (i % 2 == 0) 100 else 0).toByte }
    val fmt = new javax.sound.sampled.AudioFormat(11025f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(samples), fmt, 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val sniffed = AudioCodec.sniff(bos.toByteArray)
    assert(sniffed.contains(("pcm", 11025, 1, 16, 200L)))
  }

  test("sniff rejects garbage, truncated, non-PCM and empty payloads") {
    assert(AudioCodec.sniff(null).isEmpty)
    assert(AudioCodec.sniff(Array.empty[Byte]).isEmpty)
    assert(AudioCodec.sniff("RIFFnot really a wave file at all....".getBytes).isEmpty)
    val wav = AudioCodec.encodePcm16(100, 8000, 500, 25)
    assert(AudioCodec.sniff(wav.take(30)).isEmpty)
    assert(AudioCodec.decodeStats("garbage".getBytes).isEmpty)
    // a PNG is not audio; a WAV is not an image
    assert(AudioCodec.sniff(ImageCodec.encodePng(4, 4, 9)).isEmpty)
    assert(ImageCodec.sniff(wav).isEmpty)
  }

  test("8-bit unsigned PCM decodes through the same stats path") {
    // hand-build a tiny 8-bit mono WAV: samples 128±amp8
    val n = 64; val amp8 = 50
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes); w32(36 + n); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000); w32(8000); w16(1); w16(8)
    out.write("data".getBytes); w32(n)
    (0 until n).foreach(i => out.write(if (i % 2 == 0) 128 + amp8 else 128 - amp8))
    val Some((ns, peak, mean)) = AudioCodec.decodeStats(out.toByteArray)
    assert(ns == n)
    assert(peak == amp8 / 128.0 && mean == amp8 / 128.0)
  }

  test("framewise features: exact RMS sums and boundary-only zero crossings") {
    // 230 samples, hp=25 → frames [0,100) [100,200) [200,230)
    val bytes = AudioCodec.encodePcm16(230, 8000, 1000, 25)
    val Some(fs) = AudioCodec.frameFeatures(bytes, 100)
    assert(fs.map(f => (f._1, f._2)) == IndexedSeq((0, 100), (1, 100), (2, 30)))
    // Σv² = n · amp² exactly; crossings at k%25==0 strictly inside
    assert(fs.forall { case (_, n, sumSq, _) => sumSq == n.toLong * 1000 * 1000 })
    assert(fs.map(_._4) == IndexedSeq(3, 3, 1)) // 25/50/75; 125/150/175; 225
    // silence: zero sums, zero crossings
    val Some(fz) = AudioCodec.frameFeatures(AudioCodec.encodePcm16(120, 8000, 0, 25), 100)
    assert(fz.map(f => (f._3, f._4)) == IndexedSeq((0L, 0), (0L, 0)))
    // 8-bit payloads are refused (mono 16-bit only)
    val out8 = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out8.write(v & 0xff); out8.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out8.write("RIFF".getBytes); w32(36 + 8); out8.write("WAVE".getBytes)
    out8.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000); w32(8000); w16(1); w16(8)
    out8.write("data".getBytes); w32(8)
    (0 until 8).foreach(_ => out8.write(200))
    assert(AudioCodec.frameFeatures(out8.toByteArray, 100).isEmpty)
    // non-positive frameLen fails fast instead of spinning the frame loop
    intercept[IllegalArgumentException](AudioCodec.frameFeatures(bytes, 0))
    intercept[IllegalArgumentException](AudioCodec.frameFeatures(bytes, -4))
  }
}
