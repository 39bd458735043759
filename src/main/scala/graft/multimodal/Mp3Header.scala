package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JDK MP3 / ADTS-AAC HEADER metadata (r5 VERDICT #6): a
  * frame-header walk yielding duration / bitrate / sample-rate /
  * channel metadata WITHOUT any decode — the JDK has no MP3/AAC
  * decoder, so sample decode stays behind the tested
  * [[ExternalDecoder]] boundary, but container metadata needs none of
  * it: every MPEG audio frame header states its own version / layer /
  * bitrate / sample-rate, and the frame length is a closed form of
  * those fields (ISO/IEC 11172-3 §2.4.1.3, 13818-7 §6.2 for ADTS).
  *
  * Battery shape mirrors [[AudioCodec.sniff]] / [[ImageCodec.sniff]]:
  * byte-walk only, `None` on anything malformed, a corrupt length
  * field terminates the walk instead of running off (or backwards
  * over) the buffer. An ID3v2 prefix tag is skipped (syncsafe size,
  * optional footer), a trailing 128-byte ID3v1 "TAG" block is
  * tolerated.
  *
  * Frames in one stream must agree on version / layer / sample rate
  * (that is what makes them one stream); the BITRATE may vary per
  * frame (VBR) — `bitrateKbps` is the exact whole-stream average
  * `Σ frame_bytes · 8 · rate / (Σ samples · 1000)` truncated to int,
  * which equals the nominal bitrate for CBR streams with zero padding.
  */
object Mp3Header {

  /** Header-walk result: nSamples/sampleRate give duration;
    * durationMs is the floor'd closed form the oracle states.
    */
  final case class Meta(codec: String, sampleRate: Int, channels: Int,
                        nFrames: Int, nSamples: Long, bitrateKbps: Int) {
    def durationMs: Long = nSamples * 1000L / sampleRate
  }

  // ---- MPEG audio (MP3 et al.) tables: [version][layer] ----

  private val SampleRates = Array(
    Array(11025, 12000, 8000),   // v=0  MPEG2.5
    null,                        // v=1  reserved
    Array(22050, 24000, 16000),  // v=2  MPEG2
    Array(44100, 48000, 32000))  // v=3  MPEG1

  // kbps by bitrate index 1..14 (0 = free, 15 = bad)
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** kbps for (version 0/2/3, layer 1..3, bitrate index 1..14). */
  private def bitrateKbps(version: Int, layer: Int, idx: Int): Int =
    (version, layer) match {
      case (3, 3) => BrV1L1(idx) // layer field 3 = Layer I
      case (3, 2) => BrV1L2(idx)
      case (3, 1) => BrV1L3(idx)
      case (_, 3) => BrV2L1(idx)
      case _      => BrV2L23(idx)
    }

  /** Samples per frame for (version, layer field). */
  def samplesPerFrame(version: Int, layer: Int): Int = layer match {
    case 3 => 384                            // Layer I
    case 2 => 1152                           // Layer II
    case _ => if (version == 3) 1152 else 576 // Layer III: MPEG1 vs 2/2.5
  }

  /** Frame length in bytes — the ISO closed form (integer division). */
  def frameLength(version: Int, layer: Int, brKbps: Int, rate: Int, padding: Int): Int =
    if (layer == 3) (12 * brKbps * 1000 / rate + padding) * 4 // Layer I pads in slots of 4
    else samplesPerFrame(version, layer) / 8 * (brKbps * 1000) / rate + padding

  /** ID3v2 tag length at offset 0, or 0 if none. Syncsafe 28-bit size
    * + 10-byte header + 10-byte footer when flag 0x10 is set.
    */
  def id3v2Length(bytes: Array[Byte]): Int = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' || bytes(2) != '3')
      return 0
    val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
    10 + size + footer
  }

  /** MPEG-audio frame walk (MP3 = Layer III, but Layers I/II parse with
    * their own tables). None unless ≥1 well-formed frame starts right
    * after any ID3v2 tag and all frames agree on version/layer/rate.
    */
  def sniffMp3(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 4) return None
    var i = id3v2Length(bytes)
    if (i < 0 || i + 4 > bytes.length) return None
    var version = -1; var layer = -1; var rate = -1; var channels = 0
    var nFrames = 0; var payloadBytes = 0L
    var spf = 0
    var sane = true
    while (sane && i + 4 <= bytes.length) {
      val h1 = bytes(i) & 0xff; val h2 = bytes(i + 1) & 0xff
      val h3 = bytes(i + 2) & 0xff; val h4 = bytes(i + 3) & 0xff
      // trailing ID3v1 tag is a legal stream terminator
      if (h1 == 'T' && h2 == 'A' && h3 == 'G' && bytes.length - i == 128) {
        sane = false
      } else if (h1 != 0xff || (h2 & 0xe0) != 0xe0) {
        sane = false // lost sync: stop (frames so far still count)
      } else {
        val v = (h2 >> 3) & 3; val l = (h2 >> 1) & 3
        val brIdx = (h3 >> 4) & 15; val srIdx = (h3 >> 2) & 3
        val padding = (h3 >> 1) & 1
        val mode = (h4 >> 6) & 3
        if (v == 1 || l == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3) {
          sane = false // reserved / free / bad fields terminate the walk
        } else if (version >= 0 && (v != version || l != layer ||
            SampleRates(v)(srIdx) != rate)) {
          sane = false // stream identity must not change mid-walk
        } else {
          val r = SampleRates(v)(srIdx)
          val len = frameLength(v, l, bitrateKbps(v, l, brIdx), r, padding)
          if (len < 4 || len > bytes.length - i) {
            sane = false // truncated final frame: not counted
          } else {
            if (version < 0) {
              version = v; layer = l; rate = r
              channels = if (mode == 3) 1 else 2
              spf = samplesPerFrame(v, l)
            }
            nFrames += 1
            payloadBytes += len
            i += len
          }
        }
      }
    }
    if (nFrames == 0) None
    else {
      val nSamples = nFrames.toLong * spf
      val avgKbps = (payloadBytes * 8L * rate / (nSamples * 1000L)).toInt
      val codec = layer match {
        case 1 => "mp3"; case 2 => "mp2"; case _ => "mp1"
      }
      Some(Meta(codec, rate, channels, nFrames, nSamples, avgKbps))
    }
  }

  // ---- ADTS AAC ----

  private val AacRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** ADTS frame walk: sync 0xFFF + layer 00; each frame's 13-bit
    * length field includes the header; every raw data block is 1024
    * samples. None unless ≥1 well-formed frame and a constant
    * rate/channel identity.
    */
  def sniffAdts(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 7) return None
    var i = 0
    var rate = -1; var channels = 0
    var nFrames = 0; var nSamples = 0L; var payloadBytes = 0L
    var sane = true
    while (sane && i + 7 <= bytes.length) {
      val h0 = bytes(i) & 0xff; val h1 = bytes(i + 1) & 0xff
      if (h0 != 0xff || (h1 & 0xf6) != 0xf0) { // 12-bit sync + layer 00
        sane = false
      } else {
        val h2 = bytes(i + 2) & 0xff; val h3 = bytes(i + 3) & 0xff
        val h4 = bytes(i + 4) & 0xff; val h5 = bytes(i + 5) & 0xff
        val h6 = bytes(i + 6) & 0xff
        val srIdx = (h2 >> 2) & 15
        val chanConf = ((h2 & 1) << 2) | ((h3 >> 6) & 3)
        val frameLen = ((h3 & 3) << 11) | (h4 << 3) | (h5 >> 5)
        val rdb = h6 & 3
        if (srIdx >= AacRates.length || chanConf == 0 ||
            frameLen < 7 || frameLen > bytes.length - i) {
          sane = false
        } else if (rate >= 0 && (AacRates(srIdx) != rate ||
            (if (chanConf == 1) 1 else chanConf) != channels)) {
          sane = false
        } else {
          if (rate < 0) { rate = AacRates(srIdx); channels = if (chanConf == 1) 1 else chanConf }
          nFrames += 1
          nSamples += 1024L * (rdb + 1)
          payloadBytes += frameLen
          i += frameLen
        }
      }
    }
    if (nFrames == 0) None
    else {
      val avgKbps = (payloadBytes * 8L * rate / (nSamples * 1000L)).toInt
      Some(Meta("aac", rate, channels, nFrames, nSamples, avgKbps))
    }
  }

  /** The combined compressed-audio battery: MP3 family, then ADTS.
    * Order is safe — MP3 requires layer ≠ 0, ADTS requires layer = 0,
    * so the two syncwords are disjoint.
    */
  def sniff(bytes: Array[Byte]): Option[Meta] =
    sniffMp3(bytes).orElse(sniffAdts(bytes))

  // ---- Deterministic encoders (fixture / oracle synthesis) ----

  /** A valid CBR MPEG-audio stream of `nFrames` silent (zero-payload)
    * frames — closed-form sizes, so the DuckDB oracle can state every
    * output field without a codec. `layer` is the HEADER field
    * (1 = Layer III). Defaults produce classic 44.1 kHz mono MP3.
    */
  def encodeMp3(nFrames: Int, bitrateIdx: Int, rateIdx: Int,
                version: Int = 3, layer: Int = 1, mono: Boolean = true): Array[Byte] = {
    require(nFrames > 0 && bitrateIdx >= 1 && bitrateIdx <= 14 &&
      rateIdx >= 0 && rateIdx <= 2 && (version == 0 || version == 2 || version == 3) &&
      layer >= 1 && layer <= 3)
    val rate = SampleRates(version)(rateIdx)
    val kbps = bitrateKbps(version, layer, bitrateIdx)
    val len = frameLength(version, layer, kbps, rate, padding = 0)
    val out = new ByteArrayOutputStream(nFrames * len)
    val h1 = 0xe0 | (version << 3) | (layer << 1) | 1 // sync low bits + no CRC
    val h2 = (bitrateIdx << 4) | (rateIdx << 2)
    val h3 = if (mono) 0xc0 else 0x00
    var f = 0
    while (f < nFrames) {
      out.write(0xff); out.write(h1); out.write(h2); out.write(h3)
      out.write(new Array[Byte](len - 4))
      f += 1
    }
    out.toByteArray
  }

  /** A valid ADTS-AAC stream: `nFrames` frames, one 1024-sample raw
    * data block each, `payloadLen` zero bytes of payload per frame.
    */
  def encodeAdts(nFrames: Int, freqIdx: Int, chanConf: Int,
                 payloadLen: Int = 8): Array[Byte] = {
    require(nFrames > 0 && freqIdx >= 0 && freqIdx < AacRates.length &&
      chanConf >= 1 && chanConf <= 7 && payloadLen >= 0)
    val frameLen = 7 + payloadLen
    val out = new ByteArrayOutputStream(nFrames * frameLen)
    var f = 0
    while (f < nFrames) {
      out.write(0xff)
      out.write(0xf1)                                  // MPEG-4, layer 00, no CRC
      out.write((1 << 6) | (freqIdx << 2) | (chanConf >> 2)) // LC profile
      out.write(((chanConf & 3) << 6) | (frameLen >> 11))
      out.write((frameLen >> 3) & 0xff)
      out.write(((frameLen & 7) << 5) | 0x1f)
      out.write(0xfc)                                  // fullness low + 1 rdb
      out.write(new Array[Byte](payloadLen))
      f += 1
    }
    out.toByteArray
  }
}
