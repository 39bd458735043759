package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Fixture proofs for the pure-JDK compressed-audio HEADER walk
  * (r5 VERDICT #6): hand-built MPEG-audio and ADTS frame sequences —
  * byte-level, not produced by the code under test where it matters
  * (the first fixture is written out literally so encoder and sniffer
  * cannot share a bug) — plus ID3 skipping, VBR averaging, layer /
  * version table coverage, and corrupt-input termination.
  */
class Mp3HeaderSpec extends AnyFunSuite {

  test("literal hand-assembled MPEG1 Layer III 128kbps 44.1kHz mono frame") {
    // header: FF FB 90 C0 = sync | MPEG1 | LayerIII | noCRC, brIdx 9
    // (128 kbps), srIdx 0 (44100), no pad, mono.
    // frame length = 144 * 128000 / 44100 = 417 bytes
    val frame = Array(0xff, 0xfb, 0x90, 0xc0).map(_.toByte) ++ new Array[Byte](413)
    val m = Mp3Header.sniffMp3(frame).get
    assert(m.codec == "mp3" && m.sampleRate == 44100 && m.channels == 1)
    assert(m.nFrames == 1 && m.nSamples == 1152)
    // avg kbps = floor(417*8*44100 / (1152*1000)) = floor(127.7) = 127
    // (the integer frame length truncates below the nominal 128)
    assert(m.bitrateKbps == 127)
    assert(m.durationMs == 1152L * 1000 / 44100)
  }

  test("multi-frame CBR stream: frames count, duration closed form") {
    for (nf <- Seq(1, 2, 7); bIdx <- Seq(2, 9, 14); rIdx <- 0 to 2) {
      val bytes = Mp3Header.encodeMp3(nf, bIdx, rIdx)
      val m = Mp3Header.sniffMp3(bytes).get
      assert(m.nFrames == nf && m.nSamples == nf * 1152L)
      assert(m.sampleRate == Seq(44100, 48000, 32000)(rIdx))
      assert(m.channels == 1)
    }
  }

  test("MPEG2 Layer III uses 576 samples/frame and the low-rate table") {
    val bytes = Mp3Header.encodeMp3(4, bitrateIdx = 8, rateIdx = 0, version = 2)
    val m = Mp3Header.sniffMp3(bytes).get
    assert(m.sampleRate == 22050 && m.nSamples == 4 * 576L)
  }

  test("Layer I / Layer II samples-per-frame and codec names") {
    val l1 = Mp3Header.sniffMp3(Mp3Header.encodeMp3(3, 9, 0, layer = 3)).get
    assert(l1.codec == "mp1" && l1.nSamples == 3 * 384L)
    val l2 = Mp3Header.sniffMp3(Mp3Header.encodeMp3(3, 9, 0, layer = 2)).get
    assert(l2.codec == "mp2" && l2.nSamples == 3 * 1152L)
  }

  test("ID3v2 prefix is skipped (syncsafe size, with and without footer)") {
    val audio = Mp3Header.encodeMp3(2, 9, 0)
    // 300-byte tag body: syncsafe 300 = (2 << 7) | 44
    val noFooter = Array('I', 'D', '3', 3, 0, 0, 0, 0, 2, 44).map(_.toByte) ++
      new Array[Byte](300) ++ audio
    assert(Mp3Header.id3v2Length(noFooter) == 310)
    assert(Mp3Header.sniffMp3(noFooter).get.nFrames == 2)
    val withFooter = Array('I', 'D', '3', 4, 0, 0x10, 0, 0, 2, 44).map(_.toByte) ++
      new Array[Byte](310) ++ audio
    assert(Mp3Header.id3v2Length(withFooter) == 320)
    assert(Mp3Header.sniffMp3(withFooter).get.nFrames == 2)
  }

  test("trailing ID3v1 TAG block terminates the walk cleanly") {
    val bytes = Mp3Header.encodeMp3(3, 9, 0) ++
      ("TAG" + "x" * 125).getBytes("US-ASCII")
    assert(Mp3Header.sniffMp3(bytes).get.nFrames == 3)
  }

  test("VBR: average bitrate is the exact whole-stream rational, floored") {
    // two frames at 128 kbps (417 B) + two at 64 kbps (208 B), 44.1 kHz
    val bytes = Mp3Header.encodeMp3(2, 9, 0) ++ Mp3Header.encodeMp3(2, 5, 0)
    val m = Mp3Header.sniffMp3(bytes).get
    assert(m.nFrames == 4)
    val payload = 2L * 417 + 2L * 208
    assert(m.bitrateKbps == (payload * 8 * 44100 / (4 * 1152L * 1000)).toInt)
  }

  test("a mid-stream sample-rate change terminates the walk (stream identity)") {
    val bytes = Mp3Header.encodeMp3(2, 9, 0) ++ Mp3Header.encodeMp3(2, 9, 1)
    assert(Mp3Header.sniffMp3(bytes).get.nFrames == 2)
  }

  test("garbage, truncation, free/bad bitrate, reserved fields: None or early stop") {
    assert(Mp3Header.sniffMp3(null).isEmpty)
    assert(Mp3Header.sniffMp3(Array[Byte](1, 2, 3)).isEmpty)
    assert(Mp3Header.sniffMp3("not audio at all".getBytes).isEmpty)
    // valid header whose stated length exceeds the buffer: no frame
    assert(Mp3Header.sniffMp3(Array(0xff, 0xfb, 0x90, 0xc0).map(_.toByte)).isEmpty)
    // free-format bitrate (idx 0) is unparseable without decode
    assert(Mp3Header.sniffMp3(
      Array(0xff, 0xfb, 0x00, 0xc0).map(_.toByte) ++ new Array[Byte](500)).isEmpty)
    // reserved version bits (01)
    assert(Mp3Header.sniffMp3(
      Array(0xff, 0xeb, 0x90, 0xc0).map(_.toByte) ++ new Array[Byte](500)).isEmpty)
    // WAV payload is not an MPEG stream
    assert(Mp3Header.sniff(AudioCodec.encodePcm16(100, 8000, 100, 25)).isEmpty)
  }

  test("literal hand-assembled ADTS AAC frame (44.1kHz stereo LC)") {
    // FF F1 50 80 02 7F FC: freqIdx 4 (44100), chanConf 2,
    // frameLen = 0x13 = 19 (7 header + 12 payload), 1 raw data block
    val frame = Array(0xff, 0xf1, 0x50, 0x80, 0x02, 0x7f, 0xfc).map(_.toByte) ++
      new Array[Byte](12)
    val m = Mp3Header.sniffAdts(frame).get
    assert(m.codec == "aac" && m.sampleRate == 44100 && m.channels == 2)
    assert(m.nFrames == 1 && m.nSamples == 1024)
    assert(m.bitrateKbps == (19L * 8 * 44100 / (1024L * 1000)).toInt)
  }

  test("multi-frame ADTS: counts, rates, mono channel mapping") {
    for (nf <- Seq(1, 3, 6); fIdx <- Seq(3, 4, 8, 11)) {
      val bytes = Mp3Header.encodeAdts(nf, fIdx, chanConf = 1, payloadLen = 20)
      val m = Mp3Header.sniffAdts(bytes).get
      assert(m.nFrames == nf && m.nSamples == nf * 1024L && m.channels == 1)
      assert(m.sampleRate == Seq(96000, 88200, 64000, 48000, 44100, 32000,
        24000, 22050, 16000, 12000, 11025, 8000, 7350)(fIdx))
    }
  }

  test("ADTS truncated final frame is not counted; garbage is None") {
    val two = Mp3Header.encodeAdts(2, 4, 2, payloadLen = 10)
    assert(Mp3Header.sniffAdts(two.dropRight(5)).get.nFrames == 1)
    assert(Mp3Header.sniffAdts("nope".getBytes).isEmpty)
    assert(Mp3Header.sniffAdts(Array[Byte](0xff.toByte)).isEmpty)
  }

  test("the combined battery dispatches by syncword: disjoint layer bits") {
    assert(Mp3Header.sniff(Mp3Header.encodeMp3(2, 9, 0)).get.codec == "mp3")
    assert(Mp3Header.sniff(Mp3Header.encodeAdts(2, 4, 2)).get.codec == "aac")
  }

  test("audioMetaCompute battery: WAV stays pcm, MP3/AAC fill the compressed row") {
    val wav = AudioCodec.audioMetaCompute(AudioCodec.encodePcm16(80, 8000, 50, 25))
    assert(wav.getUTF8String(0).toString == "pcm" && wav.getInt(3) == 16)
    val mp3 = AudioCodec.audioMetaCompute(Mp3Header.encodeMp3(5, 9, 1))
    assert(mp3.getUTF8String(0).toString == "mp3")
    assert(mp3.getInt(1) == 48000 && mp3.getInt(2) == 1 && mp3.getInt(3) == 0)
    assert(mp3.getLong(4) == 5 * 1152L)
    val aac = AudioCodec.audioMetaCompute(Mp3Header.encodeAdts(3, 6, 2))
    assert(aac.getUTF8String(0).toString == "aac" && aac.getInt(1) == 24000)
    assert(aac.getLong(4) == 3 * 1024L)
    assert(AudioCodec.audioMetaCompute("junk".getBytes) == null)
  }
}
