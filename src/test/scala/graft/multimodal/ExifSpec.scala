package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[ExifReader]] on hand-built and adversarial byte streams. */
class ExifSpec extends AnyFunSuite {

  private def roundTrip(big: Boolean, wrap: Boolean): Unit = {
    val bytes = ExifReader.encode(big, wrap, width = 640, height = 480,
      orientation = 6, make = "acme", iso = 400, fnumNum = 28L, fnumDen = 10L)
    val m = ExifReader.parse(bytes).get
    assert(m.endian == (if (big) "MM" else "II"))
    assert(m.wrapped == wrap)
    assert(m.width == 640 && m.height == 480 && m.orientation == 6)
    assert(m.make == "acme" && m.iso == 400)
    assert(m.fnumNum == 28L && m.fnumDen == 10L)
  }

  test("round-trips little-endian bare TIFF")(roundTrip(big = false, wrap = false))
  test("round-trips big-endian bare TIFF")(roundTrip(big = true, wrap = false))
  test("round-trips little-endian JPEG-wrapped EXIF")(roundTrip(big = false, wrap = true))
  test("round-trips big-endian JPEG-wrapped EXIF")(roundTrip(big = true, wrap = true))

  test("JPEG walk skips a leading non-EXIF APP0 segment") {
    val tiff = ExifReader.encode(bigEndian = true, wrapJpeg = false,
      100, 50, 1, "x", 200, 20L, 10L)
    val app1 = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    out.write(0xff); out.write(0xe0)              // APP0 (JFIF) first
    out.write(0); out.write(4); out.write('J'); out.write('F')
    out.write(0xff); out.write(0xe1)
    val len = app1.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    out.write(app1, 0, app1.length)
    out.write(0xff); out.write(0xd9)
    val m = ExifReader.parse(out.toByteArray).get
    assert(m.wrapped && m.width == 100 && m.height == 50)
  }

  test("malformed inputs return None, never throw") {
    assert(ExifReader.parse(null).isEmpty)
    assert(ExifReader.parse(Array.emptyByteArray).isEmpty)
    assert(ExifReader.parse("not a tiff at all".getBytes).isEmpty)
    assert(ExifReader.parse(Array.fill[Byte](64)(0x2a)).isEmpty)
    // SOI then garbage
    assert(ExifReader.parse(Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3, 4, 5, 6)).isEmpty)
    // valid prefix, truncated mid-IFD — bounds checks must hold
    val good = ExifReader.encode(bigEndian = false, wrapJpeg = false,
      10, 10, 1, "m", 100, 10L, 10L)
    (8 until good.length by 7).foreach { cut =>
      ExifReader.parse(good.take(cut)) // must not throw
    }
    // bad magic (43 instead of 42)
    val bad = good.clone(); bad(2) = 43
    assert(ExifReader.parse(bad).isEmpty)
  }

  test("IFD entry-count bomb is bounded") {
    // claims 0xFFFF entries — reader caps at 512 and returns None/partial safely
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('I'); out.write(42); out.write(0)
    out.write(8); out.write(0); out.write(0); out.write(0)
    out.write(0xff); out.write(0xff)
    assert(ExifReader.parse(out.toByteArray).isEmpty)
  }
}
