package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip proofs that the image path is real: bytes we encode are
  * decoded by an independent reader (ImageIO reads our hand-rolled
  * PNG; our header sniffer reads ImageIO's BMP/GIF/JPEG output).
  */
class ImageCodecSpec extends AnyFunSuite {

  test("hand-rolled PNG is a valid PNG: ImageIO decodes exact dims and pixels") {
    for ((w, h, g) <- Seq((1, 1, 0), (8, 31, 255), (640, 2, 128), (31, 23, 7))) {
      val bytes = ImageCodec.encodePng(w, h, g)
      assert(ImageCodec.sniff(bytes).contains(("png", w, h)))
      assert(ImageCodec.decodeStats(bytes).contains((w, h, g)), s"dims ${w}x$h gray $g")
    }
  }

  test("sniff parses ImageIO-written BMP/GIF/JPEG headers") {
    for ((idx, name) <- Seq(1 -> "bmp", 2 -> "gif", 3 -> "jpeg")) {
      val bytes = ImageCodec.encode(29, 17, 200, idx)
      assert(ImageCodec.sniff(bytes).contains((name, 29, 17)), s"format $name")
    }
  }

  test("lossless formats round-trip every gray level exactly") {
    for (g <- 0 until 256; idx <- Seq(0, 1, 2)) {
      val bytes = ImageCodec.encode(9, 5, g, idx)
      assert(ImageCodec.decodeStats(bytes).contains((9, 5, g)), s"fmt $idx gray $g")
    }
  }

  test("jpeg: exact dims, approximate pixels (lossy)") {
    val bytes = ImageCodec.encode(40, 30, 128, 3)
    val Some((w, h, avg)) = ImageCodec.decodeStats(bytes)
    assert(w == 40 && h == 30)
    assert(math.abs(avg - 128) <= 4) // DC quantization error bound
  }

  test("sniff rejects garbage, truncated and empty payloads") {
    assert(ImageCodec.sniff(null).isEmpty)
    assert(ImageCodec.sniff(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.sniff("not an image at all".getBytes).isEmpty)
    val png = ImageCodec.encodePng(10, 10, 50)
    assert(ImageCodec.sniff(png.take(20)).isEmpty) // cut inside IHDR
    // JPEG with EOI before any SOF
    assert(ImageCodec.sniff(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    assert(ImageCodec.decodeStats("garbage".getBytes).isEmpty)
  }

  test("sniff handles JPEG fill bytes and restart markers") {
    // build: SOI, fill FFs, APP0 segment, SOF0
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    bos.write(Array(0xff, 0xe0, 0x00, 0x04, 0x00, 0x00).map(_.toByte)) // APP0 len 4
    bos.write(Array(0xff, 0xff, 0xc0).map(_.toByte)) // fill byte then SOF0
    // len=11, precision 8, height 0x0102=258, width 0x0304=772, 1 component
    bos.write(Array(0x00, 0x0b, 0x08, 0x01, 0x02, 0x03, 0x04, 0x01, 0x01, 0x11, 0x00).map(_.toByte))
    assert(ImageCodec.sniff(bos.toByteArray).contains(("jpeg", 772, 258)))
  }

  test("real resize scales pixels, not just metadata") {
    val src = ImageCodec.encodePng(16, 16, 77)
    val Some(resized) = ImageCodec.resizeTo(src, 64, 32)
    assert(ImageCodec.sniff(resized).contains(("png", 64, 32)))
    assert(ImageCodec.decodeStats(resized).contains((64, 32, 77)))
    assert(ImageCodec.resizeTo("nope".getBytes, 4, 4).isEmpty)
  }
}
