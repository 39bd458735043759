package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real, JDK-only audio codec for RIFF/WAVE PCM (round 3; the audio
  * analogue of [[ImageCodec]] — same two-tier design):
  *
  *  - [[sniff]]: pure-byte RIFF header walk (fmt + data chunks) for
  *    (codec, sample_rate, channels, bits, n_samples). Reads only the
  *    chunk headers — a metadata scan over a 100 TB audio table never
  *    touches sample data. Exposed as the codegen'd [[audioMeta]]
  *    expression.
  *  - [[decodeStats]]: full PCM sample decode (16-bit LE signed /
  *    8-bit unsigned, the two canonical WAV sample layouts) → peak and
  *    mean-absolute amplitude. Pure-JDK byte math; `javax.sound
  *    .sampled.AudioSystem` reads the same container and is used as a
  *    parity check in the spec (the byte walk is faster in the hot
  *    path — no stream plumbing per row).
  *
  * The deterministic [[encodePcm16]] encoder synthesizes a square-wave
  * WAV whose peak/mean amplitude has a closed form, so the DuckDB
  * oracle can state expected stats without any codec (the
  * extract_tables / media_decode pattern). Compressed codecs (MP3,
  * AAC, Vorbis) are NOT in the JDK: their sample DECODE remains the
  * documented [[ExternalDecoder]] boundary — but their container
  * METADATA does not need one: round 6 folds the [[Mp3Header]] frame
  * walk (MP3 family + ADTS AAC) into [[audioMetaCompute]]'s battery.
  */
object AudioCodec {

  /** Header-only metadata: (codec, sample_rate, channels, bits,
    * n_samples); None when the payload is not RIFF/WAVE. Walks chunks:
    * "RIFF" size "WAVE", then "fmt " (audio format u16 LE, channels
    * u16, sample rate u32, ..., bits u16 at offset 14 of the chunk)
    * and "data" (payload size → sample count).
    */
  def sniff(bytes: Array[Byte]): Option[(String, Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    if (!(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E')) return None
    var fmt = -1; var channels = 0; var rate = 0; var bits = 0
    var dataLen = -1L
    var i = 12
    var sane = true
    while (sane && i + 8 <= bytes.length && (fmt < 0 || dataLen < 0)) {
      val tag = new String(bytes, i, 4, "US-ASCII")
      val len = le32(i + 4)
      if (tag == "fmt " && i + 8 + 16 <= bytes.length) {
        fmt = le16(i + 8)
        channels = le16(i + 10)
        rate = le32(i + 12).toInt
        bits = le16(i + 22)
      } else if (tag == "data") {
        dataLen = math.min(len, (bytes.length - i - 8).toLong)
      }
      // chunks are word-aligned: odd sizes carry a pad byte. A corrupt
      // length (> remaining bytes, or with the high bit set) would walk
      // the cursor past the end — or BACKWARDS after toInt truncation,
      // looping forever — so treat it as a terminator.
      if (len < 0 || len > bytes.length.toLong - i - 8) sane = false
      else i += 8 + len.toInt + (len.toInt & 1)
    }
    if (fmt != 1 || channels <= 0 || rate <= 0 || bits <= 0 || dataLen < 0) return None
    val bytesPerFrame = channels * (bits / 8)
    if (bytesPerFrame == 0) return None
    Some(("pcm", rate, channels, bits, dataLen / bytesPerFrame))
  }

  /** Full sample decode → (n_samples, peak, meanAbs) over all channels,
    * amplitudes normalized to [0, 1]. Supports the two canonical PCM
    * layouts (16-bit signed LE, 8-bit unsigned). None for non-WAV or
    * non-PCM payloads.
    */
  def decodeStats(bytes: Array[Byte]): Option[(Long, Double, Double)] = {
    val meta = sniff(bytes).getOrElse(return None)
    val (_, _, channels, bits, nSamples) = meta
    if (bits != 16 && bits != 8) return None
    // find the data chunk again (sniff validated structure)
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    var i = 12
    var dataOff = -1; var dataLen = 0
    var sane = true
    while (sane && i + 8 <= bytes.length && dataOff < 0) {
      val tag = new String(bytes, i, 4, "US-ASCII")
      val len = le32(i + 4)
      if (tag == "data") { dataOff = i + 8; dataLen = math.min(len, (bytes.length - i - 8).toLong).toInt }
      if (len < 0 || len > bytes.length.toLong - i - 8) sane = false
      else i += 8 + len.toInt + (len.toInt & 1)
    }
    if (dataOff < 0) return None
    var peak = 0.0; var sumAbs = 0.0; var n = 0L
    if (bits == 16) {
      var p = dataOff
      while (p + 1 < dataOff + dataLen) {
        val v = ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort // sign via short
        val a = math.abs(v.toDouble) / 32768.0
        if (a > peak) peak = a
        sumAbs += a; n += 1
        p += 2
      }
    } else {
      var p = dataOff
      while (p < dataOff + dataLen) {
        val a = math.abs((bytes(p) & 0xff) - 128) / 128.0
        if (a > peak) peak = a
        sumAbs += a; n += 1
        p += 1
      }
    }
    if (n == 0) return None
    Some((n / channels, peak, sumAbs / n))
  }

  /** Deterministic mono 16-bit PCM WAV: a square wave alternating
    * +amp/−amp every `halfPeriod` samples (starting positive). Peak
    * and mean absolute amplitude are both exactly amp/32768 — closed
    * form for the oracle.
    */
  def encodePcm16(nSamples: Int, sampleRate: Int, amp: Int, halfPeriod: Int): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0 && halfPeriod > 0 && amp >= 0 && amp <= 32767)
    val dataLen = nSamples * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1) // PCM
    w16(1) // mono
    w32(sampleRate)
    w32(sampleRate * 2) // byte rate
    w16(2) // block align
    w16(16) // bits
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    var s = 0
    while (s < nSamples) {
      val v = if ((s / halfPeriod) % 2 == 0) amp else -amp
      w16(v & 0xffff)
      s += 1
    }
    out.toByteArray
  }

  /** Framewise feature extraction over mono 16-bit PCM: per frame of
    * `frameLen` samples, (frame_idx, n, Σv², zero-crossings). Sums are
    * exact longs (|v| ≤ 32767 ⇒ Σv² ≤ n·2³⁰, no overflow at any frame
    * length a pipeline would use); the RMS division/sqrt happens at the
    * call site so the engine-facing arithmetic stays a short IEEE
    * chain. A zero crossing is a strict sign flip between adjacent
    * samples WITHIN the frame. None for non-mono/non-16-bit payloads.
    */
  def frameFeatures(bytes: Array[Byte], frameLen: Int)
      : Option[IndexedSeq[(Int, Int, Long, Int)]] = {
    // frameLen <= 0 would make the frame loop a non-advancing spin
    // (min(frameLen, remaining) = 0) that grows the builder forever —
    // fail fast on the executor instead of hanging it.
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    val meta = sniff(bytes).getOrElse(return None)
    val (_, _, channels, bits, _) = meta
    if (bits != 16 || channels != 1) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    var i = 12
    var dataOff = -1; var dataLen = 0
    var sane = true
    while (sane && i + 8 <= bytes.length && dataOff < 0) {
      val tag = new String(bytes, i, 4, "US-ASCII")
      val len = le32(i + 4)
      if (tag == "data") { dataOff = i + 8; dataLen = math.min(len, (bytes.length - i - 8).toLong).toInt }
      if (len < 0 || len > bytes.length.toLong - i - 8) sane = false
      else i += 8 + len.toInt + (len.toInt & 1)
    }
    if (dataOff < 0) return None
    val nS = dataLen / 2
    val samp = new Array[Int](nS)
    var p = 0
    while (p < nS) {
      samp(p) = ((bytes(dataOff + 2 * p) & 0xff) | (bytes(dataOff + 2 * p + 1) << 8)).toShort.toInt
      p += 1
    }
    val out = IndexedSeq.newBuilder[(Int, Int, Long, Int)]
    var fi = 0
    var s = 0
    while (s < nS) {
      val l = math.min(frameLen, nS - s)
      var sumSq = 0L; var zc = 0
      var j = s
      while (j < s + l) {
        val v = samp(j)
        sumSq += v.toLong * v
        if (j > s && ((samp(j - 1) < 0) != (v < 0))) zc += 1
        j += 1
      }
      out += ((fi, l, sumSq, zc))
      fi += 1; s += l
    }
    Some(out.result())
  }

  // ---- Catalyst surface ----

  private val MetaStruct = StructType(Seq(
    StructField("codec", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType)))

  /** Static entry for codegen: header sniff → InternalRow or null.
    * Battery: RIFF/WAVE first, then the compressed-container walk
    * ([[Mp3Header]]: MP3 family + ADTS AAC — r5 VERDICT #6). For
    * compressed codecs `bits` is 0 (no PCM word size without decode);
    * n_samples comes from the frame walk, so duration is
    * n_samples/sample_rate with zero decode work.
    */
  def audioMetaCompute(bytes: Array[Byte]): InternalRow =
    sniff(bytes) match {
      case Some((c, r, ch, b, n)) =>
        InternalRow(UTF8String.fromString(c), r, ch, b, n)
      case None => Mp3Header.sniff(bytes) match {
        case Some(m) =>
          InternalRow(UTF8String.fromString(m.codec), m.sampleRate, m.channels, 0, m.nSamples)
        case None => null
      }
    }

  /** `audio_meta(binary) → struct<codec,sample_rate,channels,bits,
    * n_samples>` — header-only, codegen'd, null for non-audio payloads.
    */
  case class AudioMeta(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = MetaStruct
    override def nullable: Boolean = true
    override def prettyName: String = "audio_meta"
    override protected def nullSafeEval(input: Any): Any =
      audioMetaCompute(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        InternalRow ${ev.value}_r = graft.multimodal.AudioCodec.audioMetaCompute($c);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }
      """)
    override protected def withNewChildInternal(newChild: Expression): AudioMeta =
      copy(child = newChild)
  }

  def audioMeta(c: Column): Column =
    GraftColumnBridge.column(AudioMeta(GraftColumnBridge.expression(c)))

  // ---- Compressed-container metadata (MP3 family / ADTS AAC) ----

  private val CompressedMetaStruct = StructType(Seq(
    StructField("codec", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_samples", LongType),
    StructField("kbps", IntegerType)))

  /** Static entry for codegen: [[Mp3Header.sniff]] → InternalRow or
    * null. Richer than [[audioMetaCompute]] (frame count + exact
    * whole-stream average bitrate), still header-only.
    */
  def compressedAudioMetaCompute(bytes: Array[Byte]): InternalRow =
    Mp3Header.sniff(bytes) match {
      case Some(m) => InternalRow(UTF8String.fromString(m.codec),
        m.sampleRate, m.channels, m.nFrames, m.nSamples, m.bitrateKbps)
      case None => null
    }

  /** `compressed_audio_meta(binary) → struct<codec,sample_rate,
    * channels,n_frames,n_samples,kbps>` — MP3/ADTS frame-header walk,
    * codegen'd, null for anything else. Duration is
    * n_samples/sample_rate; no decode happens anywhere.
    */
  case class CompressedAudioMeta(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = CompressedMetaStruct
    override def nullable: Boolean = true
    override def prettyName: String = "compressed_audio_meta"
    override protected def nullSafeEval(input: Any): Any =
      compressedAudioMetaCompute(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        InternalRow ${ev.value}_r = graft.multimodal.AudioCodec.compressedAudioMetaCompute($c);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }
      """)
    override protected def withNewChildInternal(newChild: Expression): CompressedAudioMeta =
      copy(child = newChild)
  }

  def compressedAudioMeta(c: Column): Column =
    GraftColumnBridge.column(CompressedAudioMeta(GraftColumnBridge.expression(c)))
}
