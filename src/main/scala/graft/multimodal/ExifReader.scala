package graft.multimodal

/** Pure-JDK TIFF/EXIF metadata reader — the image-side sibling of
  * [[Mp3Header]]: a bounded header walk that never decodes pixels.
  * Handles both byte orders ("II" little / "MM" big), bare TIFF
  * streams and JPEG-wrapped EXIF (SOI → APP1 "Exif\0\0" → embedded
  * TIFF), IFD0 scalar tags and the EXIF private sub-IFD (0x8769) with
  * an unsigned-RATIONAL field. Every read is bounds-checked; anything
  * malformed returns None rather than throwing — executor-safe on
  * hostile bytes.
  *
  * Format facts are public TIFF 6.0 / EXIF 2.3 spec structure:
  * IFD = u16 entry count, then 12-byte entries (tag u16, type u16,
  * count u32, value-or-offset u32, values ≤4 bytes packed inline from
  * the field's first byte), then u32 next-IFD offset; offsets are from
  * the TIFF header start.
  */
object ExifReader {

  final case class Meta(endian: String, wrapped: Boolean, width: Int,
                        height: Int, orientation: Int, make: String,
                        iso: Int, fnumNum: Long, fnumDen: Long)

  private val TagWidth = 0x0100
  private val TagHeight = 0x0101
  private val TagMake = 0x010f
  private val TagOrientation = 0x0112
  private val TagExifIfd = 0x8769
  private val TagFNumber = 0x829d
  private val TagIso = 0x8827

  // ---- encode (synthesis side: a real, spec-shaped EXIF payload) ----

  /** Build a TIFF/EXIF stream; `bigEndian` picks MM/II, `wrapJpeg`
    * wraps it in SOI + APP1 like a camera JPEG.
    */
  def encode(bigEndian: Boolean, wrapJpeg: Boolean, width: Int, height: Int,
             orientation: Int, make: String, iso: Int,
             fnumNum: Long, fnumDen: Long): Array[Byte] = {
    val makeBytes = make.getBytes("US-ASCII") :+ 0.toByte
    val makeOff = 8 + 2 + 5 * 12 + 4                  // after IFD0
    val exifOff = makeOff + makeBytes.length + (makeBytes.length & 1)
    val ratOff = exifOff + 2 + 2 * 12 + 4
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (bigEndian) { out.write(v >> 8); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write(v >> 8) }
    def u32(v: Long): Unit =
      if (bigEndian) { out.write((v >> 24).toInt & 0xff); out.write((v >> 16).toInt & 0xff)
        out.write((v >> 8).toInt & 0xff); out.write(v.toInt & 0xff) }
      else { out.write(v.toInt & 0xff); out.write((v >> 8).toInt & 0xff)
        out.write((v >> 16).toInt & 0xff); out.write((v >> 24).toInt & 0xff) }
    // SHORT values pack into the first two bytes of the value field
    def entryShort(tag: Int, v: Int): Unit = { u16(tag); u16(3); u32(1); u16(v); u16(0) }
    def entryLong(tag: Int, v: Long): Unit = { u16(tag); u16(4); u32(1); u32(v) }
    def entryOff(tag: Int, typ: Int, count: Long, off: Long): Unit = {
      u16(tag); u16(typ); u32(count); u32(off)
    }
    out.write(if (bigEndian) 'M' else 'I'); out.write(if (bigEndian) 'M' else 'I')
    u16(42); u32(8)
    u16(5)                                            // IFD0, tags ascending
    entryShort(TagWidth, width)
    entryShort(TagHeight, height)
    entryOff(TagMake, 2, makeBytes.length.toLong, makeOff.toLong)
    entryShort(TagOrientation, orientation)
    entryLong(TagExifIfd, exifOff.toLong)
    u32(0)                                            // no IFD1
    out.write(makeBytes)
    if ((makeBytes.length & 1) == 1) out.write(0)     // even alignment
    u16(2)                                            // EXIF sub-IFD
    entryOff(TagFNumber, 5, 1L, ratOff.toLong)
    entryShort(TagIso, iso)
    u32(0)
    u32(fnumNum); u32(fnumDen)
    val tiff = out.toByteArray
    if (!wrapJpeg) tiff
    else {
      val o2 = new java.io.ByteArrayOutputStream()
      o2.write(0xff); o2.write(0xd8)                  // SOI
      val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      o2.write(0xff); o2.write(0xe1)                  // APP1
      val len = payload.length + 2                    // JPEG lengths include the u16 itself
      o2.write(len >> 8); o2.write(len & 0xff)        // always big-endian in JPEG
      o2.write(payload, 0, payload.length)
      o2.write(0xff); o2.write(0xd9)                  // EOI
      o2.toByteArray
    }
  }

  // ---- parse ----

  def parse(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 8) return None
    if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      findApp1(bytes).flatMap { case (off, len) => parseTiff(bytes, off, len, wrapped = true) }
    else parseTiff(bytes, 0, bytes.length, wrapped = false)
  }

  /** Walk JPEG markers for APP1 "Exif\0\0"; stop at SOS/EOI. */
  private def findApp1(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xda || marker == 0xd9) return None
      val segLen = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (segLen < 2 || i + 2 + segLen > b.length) return None
      if (marker == 0xe1 && segLen >= 8 &&
        b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' && b(i + 7) == 'f' &&
        b(i + 8) == 0 && b(i + 9) == 0)
        return Some((i + 10, segLen - 8))
      i += 2 + segLen
    }
    None
  }

  private def parseTiff(b: Array[Byte], base: Int, len: Int,
                        wrapped: Boolean): Option[Meta] = {
    val end = math.min(base + len, b.length)
    if (end - base < 8) return None
    val big = (b(base) == 'M' && b(base + 1) == 'M')
    val little = (b(base) == 'I' && b(base + 1) == 'I')
    if (!big && !little) return None
    def u16(off: Int): Int = {
      if (off < base || off + 2 > end) return -1
      if (big) ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      else ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)
    }
    def u32(off: Int): Long = {
      if (off < base || off + 4 > end) return -1L
      if (big) ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      else ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
        ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)
    }
    if (u16(base + 2) != 42) return None
    val ifd0 = u32(base + 4)
    if (ifd0 < 0 || ifd0 > Int.MaxValue) return None

    // one IFD pass → (tag → (type, count, valueFieldOffset))
    def readIfd(off: Int): Map[Int, (Int, Long, Int)] = {
      val n = u16(off)
      if (n < 0 || n > 512) return Map.empty
      (0 until n).flatMap { i =>
        val e = off + 2 + i * 12
        val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
        if (tag < 0 || typ < 0 || cnt < 0) None
        else Some(tag -> ((typ, cnt, e + 8)))
      }.toMap
    }
    def shortVal(ent: (Int, Long, Int)): Int =
      if (ent._1 == 3 && ent._2 == 1) u16(ent._3)
      else if (ent._1 == 4 && ent._2 == 1) u32(ent._3).toInt
      else -1
    def asciiVal(ent: (Int, Long, Int)): String = {
      if (ent._1 != 2 || ent._2 <= 0 || ent._2 > 256) return null
      val off = if (ent._2 <= 4) ent._3 else {
        val o = u32(ent._3); if (o < 0) return null; base + o.toInt
      }
      if (off < base || off + ent._2 > end) return null
      val raw = new String(b, off, ent._2.toInt - 1, "US-ASCII")
      raw.takeWhile(_ != 0)
    }
    def rationalVal(ent: (Int, Long, Int)): Option[(Long, Long)] = {
      if (ent._1 != 5 || ent._2 != 1) return None
      val o = u32(ent._3); if (o < 0) return None
      val off = base + o.toInt
      val num = u32(off); val den = u32(off + 4)
      if (num < 0 || den < 0) None else Some((num, den))
    }

    val ifd = readIfd(base + ifd0.toInt)
    if (ifd.isEmpty) return None
    val width = ifd.get(TagWidth).map(shortVal).getOrElse(-1)
    val height = ifd.get(TagHeight).map(shortVal).getOrElse(-1)
    val orient = ifd.get(TagOrientation).map(shortVal).getOrElse(-1)
    val make = ifd.get(TagMake).map(asciiVal).orNull
    val sub = ifd.get(TagExifIfd).map(e => u32(e._3)).getOrElse(-1L)
    val (iso, fn) =
      if (sub >= 0 && sub <= Int.MaxValue) {
        val s = readIfd(base + sub.toInt)
        (s.get(TagIso).map(shortVal).getOrElse(-1),
          s.get(TagFNumber).flatMap(rationalVal))
      } else (-1, None)
    if (width < 0 || height < 0) return None
    Some(Meta(if (big) "MM" else "II", wrapped, width, height, orient,
      if (make == null) "" else make, iso,
      fn.map(_._1).getOrElse(0L), fn.map(_._2).getOrElse(0L)))
  }
}
