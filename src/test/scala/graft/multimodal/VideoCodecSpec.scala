package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Proofs that the video path is real: the synthesized MJPEG AVI is a
  * structurally valid RIFF container whose extracted frames are
  * independently decodable JPEGs with the declared dimensions and
  * (within JPEG's lossy tolerance) the declared pixel content.
  */
class VideoCodecSpec extends AnyFunSuite {

  test("sniff reads back the container parameters it encoded") {
    for ((w, h, nf, fps) <- Seq((8, 8, 2, 10), (32, 24, 7, 15), (17, 9, 5, 20))) {
      val bytes = VideoCodec.encodeMjpegAvi(w, h, nf, fps, 100)
      assert(VideoCodec.sniff(bytes).contains(("mjpeg", w, h, nf, fps)),
        s"${w}x$h nf=$nf fps=$fps")
    }
  }

  test("frames extracts every frame; each is a real JPEG with exact dims") {
    val bytes = VideoCodec.encodeMjpegAvi(20, 12, 5, 10, 77)
    val fs = VideoCodec.frames(bytes)
    assert(fs.length == 5)
    fs.foreach { f =>
      assert(ImageCodec.sniff(f).contains(("jpeg", 20, 12)))
      // JPEG pixels are lossy: constant-gray survives within DC error
      val Some((w, h, avg)) = ImageCodec.decodeStats(f)
      assert(w == 20 && h == 12 && math.abs(avg - 77) <= 4)
    }
  }

  test("sampleFrames takes every k-th frame in order") {
    val bytes = VideoCodec.encodeMjpegAvi(10, 10, 7, 10, 50)
    assert(VideoCodec.sampleFrames(bytes, 2).length == 4) // 0,2,4,6
    assert(VideoCodec.sampleFrames(bytes, 3).length == 3) // 0,3,6
    assert(VideoCodec.sampleFrames(bytes, 1).length == 7)
  }

  test("sniff rejects non-AVI payloads and other RIFF files (WAV)") {
    assert(VideoCodec.sniff(null).isEmpty)
    assert(VideoCodec.sniff(Array.empty[Byte]).isEmpty)
    assert(VideoCodec.sniff("RIFFxxxxWAVEnot a movie".getBytes).isEmpty)
    assert(VideoCodec.sniff(AudioCodec.encodePcm16(100, 8000, 500, 25)).isEmpty)
    assert(VideoCodec.sniff(ImageCodec.encodePng(4, 4, 0)).isEmpty)
    assert(VideoCodec.frames("garbage".getBytes).isEmpty)
    // and audio/image sniffers reject the AVI
    val avi = VideoCodec.encodeMjpegAvi(8, 8, 2, 10, 1)
    assert(AudioCodec.sniff(avi).isEmpty)
    assert(ImageCodec.sniff(avi).isEmpty)
  }

  test("truncated container: no frames, no crash") {
    val bytes = VideoCodec.encodeMjpegAvi(16, 16, 4, 10, 128)
    val cut = bytes.take(bytes.length / 2)
    // sniff may or may not still see the header; frames must not throw
    val fs = VideoCodec.frames(cut)
    assert(fs.length <= 4)
  }
}
