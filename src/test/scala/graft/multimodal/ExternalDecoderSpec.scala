package graft.multimodal

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec

/** The external-decoder hook proven with test-fake MP3/H.264 decoders:
  * lifecycle (one instance per partition, created on the executor,
  * closed at partition end), schema parity with the JDK media paths,
  * and in-batch fallback composition for mixed media. A real libav
  * binding implementing [[ExternalDecoder]] is a drop-in behind the
  * same factory.
  */
object ExternalDecoderSpec {
  // static (per-JVM) counters: local-mode executors share the JVM, so
  // the spec can observe construction/close balance across partitions
  val constructed = new AtomicInteger(0)
  val closed = new AtomicInteger(0)

  /** Deterministic fake MP3: recognizes an ID3 header; "decodes" n
    * samples derived from the payload bytes (value i = byte i scaled).
    */
  final class FakeMp3Decoder extends ExternalDecoder {
    constructed.incrementAndGet()
    override def accepts(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 3 &&
        bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'
    override def decodeAudio(bytes: Array[Byte]): Option[Array[Double]] =
      if (!accepts(bytes)) None
      else Some(bytes.drop(3).map(b => (b & 0xff) / 255.0))
    override def decodeVideoFrames(bytes: Array[Byte], everyK: Int): Seq[Array[Byte]] = Nil
    override def close(): Unit = closed.incrementAndGet()
  }

  /** Deterministic fake H.264: recognizes an Annex-B start code;
    * "decodes" one frame per 8-byte chunk, sampling every k-th.
    */
  final class FakeH264Decoder extends ExternalDecoder {
    constructed.incrementAndGet()
    override def accepts(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 4 &&
        bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 0 && bytes(3) == 1
    override def decodeAudio(bytes: Array[Byte]): Option[Array[Double]] = None
    override def decodeVideoFrames(bytes: Array[Byte], everyK: Int): Seq[Array[Byte]] =
      if (!accepts(bytes)) Nil
      else bytes.drop(4).grouped(8).toSeq.zipWithIndex
        .collect { case (chunk, i) if i % everyK == 0 => chunk }
    override def close(): Unit = closed.incrementAndGet()
  }
}

class ExternalDecoderSpec extends SparkSpec {
  import ExternalDecoderSpec._
  import spark.implicits._

  test("fake MP3 decodes through the hook; WAV rows fall back to the JDK kernel in the same batch") {
    val wav = AudioCodec.encodePcm16(100, 8000, 500, 25)
    val mp3 = "ID3".getBytes ++ Array[Byte](0, 51, 102, (255 & 0xff).toByte)
    val junk = "not media at all".getBytes
    val df = Seq(("wav1", wav), ("mp3_1", mp3), ("junk", junk))
      .toDF("id", "bytes").repartition(2)

    constructed.set(0); closed.set(0)
    val out = ExternalDecoder.audioFeatures(df, "id", "bytes",
      () => new FakeMp3Decoder).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap

    // fake MP3 path: 4 samples from the payload bytes, exact arithmetic
    val expSamples = Array(0, 51, 102, 255).map(_ / 255.0)
    assert(out("mp3_1") == ((4L, 1.0, expSamples.sum / 4, true)))
    // WAV fell back to the real JDK PCM kernel — non-trivial stats
    val (nW, peakW, _, okW) = out("wav1")
    assert(okW && nW == 100L && peakW > 0.0)
    // unrecognized payload: decoded=false, zeroed stats
    assert(out("junk") == ((0L, 0.0, 0.0, false)))
    // lifecycle: one decoder per non-empty partition, every one closed
    assert(constructed.get() > 0 && constructed.get() <= 2,
      s"expected <=1 decoder per partition, got ${constructed.get()}")
    assert(closed.get() == constructed.get(),
      s"constructed ${constructed.get()} but closed ${closed.get()}")
  }

  test("fake H.264 samples frames through the hook with the sampleVideoFrames schema") {
    val h264 = Array[Byte](0, 0, 0, 1) ++ (0 until 40).map(_.toByte).toArray
    val df = Seq(("v1", h264)).toDF("id", "bytes")
    constructed.set(0); closed.set(0)
    val out = ExternalDecoder.sampleFrames(df, "id", "bytes", everyK = 2,
      () => new FakeH264Decoder)
    assert(out.columns.toSeq == Seq("id", "frame_idx", "frame"))
    val rows = out.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
    // 40 bytes → 5 chunks of 8 → every 2nd → chunks 0, 2, 4
    assert(rows.length == 3)
    assert(rows.map(_._2).toSeq == Seq(0, 2, 4))
    assert(rows(0)._3 == (0 until 8).map(_.toByte).toSeq)
    assert(rows(1)._3 == (16 until 24).map(_.toByte).toSeq)
    assert(closed.get() == constructed.get() && constructed.get() > 0)
  }

  test("an AVI payload routes to the JDK MJPEG walker when the external decoder declines") {
    // real MJPEG-in-AVI fixture from the main-code encoder helper
    val avi = VideoCodec.encodeMjpegAvi(16, 16, 3, 10, 99)
    val df = Seq(("avi1", avi)).toDF("id", "bytes")
    val viaHook = ExternalDecoder.sampleFrames(df, "id", "bytes", everyK = 1,
      () => new FakeH264Decoder).collect()
    val direct = Multimodal.sampleVideoFrames(df, "id", "bytes", everyK = 1).collect()
    assert(viaHook.length == direct.length && viaHook.length == 3)
    assert(viaHook.map(_.getInt(1)).toSeq == direct.map(_.getInt(1)).toSeq)
  }
}
