package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3 legacy `.xls` (BIFF8) source — the reference reads BOTH .xls and
  * .xlsx through pyexcel (dig_tabular_import.py:107-110); round 1
  * covered only .xlsx. JDK-only implementation of the two public
  * layouts involved:
  *
  *  - the OLE2/CFB compound-document container ([MS-CFB]): header,
  *    FAT chains, directory, and the mini-FAT/mini-stream that small
  *    workbooks (< 4096 bytes) actually live in;
  *  - the BIFF8 record stream ([MS-XLS]): BOUNDSHEET / SST /
  *    LABELSST / LABEL / NUMBER / RK / MULRK / FORMULA-number records.
  *
  * Produces the same engine-neutral cell grid (sheet, row, col, value)
  * as [[XlsxReader]], so S4 region extraction runs on legacy workbooks
  * unchanged. SST CONTINUE-record splitting IS handled (including the
  * mid-string option-byte encoding switch); rich-text/phonetic payload
  * CONTENT is skipped (correctly stepped over). BIFF5 (.xls written by
  * Excel 5.0/95) parses through the same record walk via BOF version
  * dispatch (round 4): ANSI byte strings, no SST — the record subset
  * pre-97 writers emit for data cells.
  */
object XlsReader {

  // ---- CFB container ([MS-CFB]) ----

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Locate and reassemble the Workbook/Book stream from a CFB file. */
  def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length > 512 &&
      u32(bytes, 0) == 0xE011CFD0 && u32(bytes, 4) == 0xE11AB1A1,
      "not an OLE2 compound document (.xls)")
    val sectorSize = 1 << u16(bytes, 30)
    val miniSize = 1 << u16(bytes, 32)
    val firstDir = u32(bytes, 48)
    val miniCutoff = u32(bytes, 56)
    val firstMiniFat = u32(bytes, 60)
    // sector i starts at (i+1) << sectorShift: for v3 (512-byte sectors)
    // that is 512 + i*512, and for v4 (4096-byte sectors) the header
    // occupies the whole first sector — a flat 512 offset would read
    // v4 directories 3584 bytes off
    def sector(i: Int): Array[Byte] =
      bytes.slice((i + 1) * sectorSize, (i + 2) * sectorSize)
    // FAT from the header DIFAT (109 entries — enough for <7 MB files;
    // DIFAT-sector extension files are far beyond workbook uploads)
    val fat = ArrayBuffer[Int]()
    for (i <- 0 until 109) {
      val s = u32(bytes, 76 + i * 4)
      if (s != FreeSect) {
        val sec = sector(s)
        for (j <- 0 until sectorSize / 4) fat += u32(sec, j * 4)
      }
    }
    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var cur = start
      var guard = 0
      while (cur != EndOfChain && cur >= 0 && guard < fat.length + 1) {
        out.write(sector(cur))
        cur = fat(cur)
        guard += 1
      }
      out.toByteArray
    }
    val dir = chain(firstDir)
    final case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val off = i * 128
      val nameLen = u16(dir, off + 64)
      val name = new String(dir, off, math.max(0, nameLen - 2), "UTF-16LE")
      Entry(name, dir(off + 66) & 0xff, u32(dir, off + 116),
        u32(dir, off + 120).toLong & 0xFFFFFFFFL)
    }
    val wb = entries.find(e => e.objType == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(throw new IllegalArgumentException("no Workbook/Book stream"))
    if (wb.size >= miniCutoff) chain(wb.start).take(wb.size.toInt)
    else {
      // mini-stream: the root entry's regular-FAT stream, chopped into
      // 64-byte mini sectors chained through the mini-FAT
      val root = entries.find(_.objType == 5)
        .getOrElse(throw new IllegalArgumentException("no root entry"))
      val mini = chain(root.start)
      val miniFat = {
        val raw = chain(firstMiniFat)
        (0 until raw.length / 4).map(j => u32(raw, j * 4))
      }
      val out = new java.io.ByteArrayOutputStream()
      var cur = wb.start
      var guard = 0
      while (cur != EndOfChain && cur >= 0 && guard <= miniFat.length) {
        out.write(mini, cur * miniSize, miniSize)
        cur = miniFat(cur)
        guard += 1
      }
      out.toByteArray.take(wb.size.toInt)
    }
  }

  // ---- BIFF8 records ([MS-XLS]) ----

  /** Cursor over the SST payload plus its CONTINUE-record payloads,
    * implementing the BIFF8 continued-string rules: a record boundary
    * crossed inside CHARACTER DATA starts with a fresh option byte (the
    * 8-bit/UTF-16 encoding may switch mid-string); boundaries inside
    * headers, rich-text runs or ext blocks do not.
    */
  private final class SstCursor(segs: IndexedSeq[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def ensure(): Unit =
      while (si < segs.length && off >= segs(si).length) { si += 1; off = 0 }
    def u8(): Int = { ensure(); val v = segs(si)(off) & 0xff; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Int = u16() | (u16() << 16)
    def skip(n: Int): Unit = {
      var r = n
      while (r > 0) {
        ensure()
        if (si >= segs.length) return
        val take = math.min(r, segs(si).length - off)
        off += take; r -= take
      }
    }
    def atEnd: Boolean = { ensure(); si >= segs.length }
    def chars(cch: Int, wide0: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var wide = wide0
      var remaining = cch
      while (remaining > 0 && si < segs.length) {
        if (off >= segs(si).length) { // crossing mid-chars: new option byte
          si += 1; off = 0
          // zero-length CONTINUE records are legal — skip them before
          // reading the option byte
          while (si < segs.length && segs(si).isEmpty) si += 1
          if (si >= segs.length) return sb.toString
          wide = (segs(si)(0) & 0x01) != 0
          off = 1
        }
        val bytesPer = if (wide) 2 else 1
        val take = math.min(remaining, (segs(si).length - off) / bytesPer)
        if (take == 0) off = segs(si).length // odd trailing byte: defensive
        else {
          if (wide) sb.append(new String(segs(si), off, take * 2, "UTF-16LE"))
          else {
            var i = 0
            while (i < take) { sb.append((segs(si)(off + i) & 0xff).toChar); i += 1 }
          }
          off += take * bytesPer
          remaining -= take
        }
      }
      sb.toString
    }
  }

  /** Parse the SST string table from its payload + CONTINUE payloads. */
  private def parseSst(segs: IndexedSeq[Array[Byte]]): IndexedSeq[String] = {
    val cur = new SstCursor(segs)
    cur.u32() // cstTotal
    val cstUnique = cur.u32()
    val out = ArrayBuffer[String]()
    var i = 0
    while (i < cstUnique && !cur.atEnd) {
      val cch = cur.u16()
      val flags = cur.u8()
      val cRun = if ((flags & 0x08) != 0) cur.u16() else 0
      val cbExt = if ((flags & 0x04) != 0) cur.u32() else 0
      out += cur.chars(cch, (flags & 0x01) != 0)
      cur.skip(cRun * 4 + cbExt)
      i += 1
    }
    out.toIndexedSeq
  }

  /** BIFF8 short/long unicode string at `off`; returns (text, bytesRead).
    * 8-bit compressed or UTF-16LE per the grbit flag; rich-text runs and
    * extended (phonetic) blocks are skipped.
    */
  private def xlString(b: Array[Byte], off: Int): (String, Int) = {
    val cch = u16(b, off)
    val flags = b(off + 2) & 0xff
    var p = off + 3
    val cRun = if ((flags & 0x08) != 0) { val r = u16(b, p); p += 2; r } else 0
    val cbExt = if ((flags & 0x04) != 0) { val r = u32(b, p); p += 4; r } else 0
    val (text, n) =
      if ((flags & 0x01) != 0) (new String(b, p, cch * 2, "UTF-16LE"), cch * 2)
      else (new String(b.slice(p, p + cch).map(x => (x & 0xff).toChar)), cch)
    p += n + cRun * 4 + cbExt
    (text, p - off)
  }

  /** RK-compressed number (RkNumber): 30-bit int or truncated double,
    * optionally scaled by 1/100.
    */
  def decodeRk(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  /** Integral doubles render without the trailing ".0" — the all-strings
    * tabular contract (dig_tabular_import does no type detection).
    */
  def formatNum(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Parse a workbook's .xls bytes → cell grid of the selected sheet
    * (1-based `sheetNumber`) or all sheets. Sheet names come from the
    * BOUNDSHEET table (real names, as pyexcel reports them).
    */
  def parseWorkbook(bytes: Array[Byte], sheetNumber: Option[Int] = None): Seq[XlsxReader.Cell] = {
    val s = workbookStream(bytes)
    // BIFF version dispatch from the globals BOF (round 4): vers
    // 0x0500 = BIFF5 (Excel 5.0/95 — the pre-97 workbooks pyexcel
    // still reads). BIFF5 subset: same record ids for BOUNDSHEET/
    // LABEL/NUMBER/RK/MULRK/FORMULA, but strings are ANSI byte runs
    // (no grbit option flags) and there is no SST/LABELSST.
    val biff5 = s.length >= 6 && u16(s, 0) == 0x809 && u16(s, 4) == 0x0500
    // pass 1: workbook globals — sheet table + shared strings
    val sheets = ArrayBuffer[(String, Int)]() // (name, stream offset of sheet BOF)
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var p = 0
    var inGlobals = true
    while (p + 4 <= s.length && inGlobals) {
      val typ = u16(s, p); val len = u16(s, p + 2)
      typ match {
        case 0x85 => // BOUNDSHEET
          val pos = u32(s, p + 4)
          val cch = s(p + 10) & 0xff
          val name =
            if (biff5) // ANSI bytes immediately after cch, no flags
              new String(s.slice(p + 11, p + 11 + cch).map(x => (x & 0xff).toChar))
            else {
              val hi = (s(p + 11) & 0x01) != 0
              if (hi) new String(s, p + 12, cch * 2, "UTF-16LE")
              else new String(s.slice(p + 12, p + 12 + cch).map(x => (x & 0xff).toChar))
            }
          sheets += ((name, pos))
        case 0xFC => // SST + any immediately-following CONTINUE records
          val segs = ArrayBuffer[Array[Byte]](s.slice(p + 4, p + 4 + len))
          var q = p + 4 + len
          while (q + 4 <= s.length && u16(s, q) == 0x3C) { // CONTINUE
            val clen = u16(s, q + 2)
            segs += s.slice(q + 4, q + 4 + clen)
            q += 4 + clen
          }
          sst = parseSst(segs.toIndexedSeq)
        case 0x0A => inGlobals = false // EOF of globals substream
        case _ =>
      }
      p += 4 + len
    }
    val picked: Seq[(String, Int)] = (sheetNumber match {
      case Some(i) => sheets.slice(i - 1, i)
      case None => sheets
    }).toSeq
    // pass 2: each selected sheet substream
    picked.flatMap { case (name, bof) =>
      val out = ArrayBuffer[XlsxReader.Cell]()
      var q = bof
      var done = false
      while (q + 4 <= s.length && !done) {
        val typ = u16(s, q); val len = u16(s, q + 2); val d = q + 4
        typ match {
          case 0xFD => // LABELSST
            val idx = u32(s, d + 6)
            out += XlsxReader.Cell(name, u16(s, d), u16(s, d + 2),
              if (idx < sst.length) sst(idx) else "")
          case 0x204 => // LABEL (inline string)
            val v =
              if (biff5) { // cch u16 + ANSI bytes, no grbit
                val cch = u16(s, d + 6)
                new String(s.slice(d + 8, d + 8 + cch).map(x => (x & 0xff).toChar))
              } else xlString(s, d + 6)._1
            out += XlsxReader.Cell(name, u16(s, d), u16(s, d + 2), v)
          case 0x203 => // NUMBER (IEEE double)
            val bits = (u32(s, d + 6).toLong & 0xFFFFFFFFL) |
              ((u32(s, d + 10).toLong & 0xFFFFFFFFL) << 32)
            out += XlsxReader.Cell(name, u16(s, d), u16(s, d + 2),
              formatNum(java.lang.Double.longBitsToDouble(bits)))
          case 0x27E => // RK
            out += XlsxReader.Cell(name, u16(s, d), u16(s, d + 2),
              formatNum(decodeRk(u32(s, d + 6))))
          case 0xBD => // MULRK: row, colFirst, n x (ixfe, rk), colLast
            val row = u16(s, d); val colFirst = u16(s, d + 2)
            val n = (len - 6) / 6
            for (i <- 0 until n)
              out += XlsxReader.Cell(name, row, colFirst + i,
                formatNum(decodeRk(u32(s, d + 4 + i * 6 + 2))))
          case 0x06 => // FORMULA: cached numeric result only
            val b6 = s(d + 12) & 0xff; val b7 = s(d + 13) & 0xff
            if (!(b6 == 0xFF && b7 == 0xFF)) { // else string/bool/err result
              val bits = (u32(s, d + 6).toLong & 0xFFFFFFFFL) |
                ((u32(s, d + 10).toLong & 0xFFFFFFFFL) << 32)
              out += XlsxReader.Cell(name, u16(s, d), u16(s, d + 2),
                formatNum(java.lang.Double.longBitsToDouble(bits)))
            }
          case 0x0A => done = true // sheet EOF
          case _ =>
        }
        q += 4 + len
      }
      out.toSeq
    }
  }

  /** Distributed read mirroring [[XlsxReader.read]]: every .xls under
    * `path` parses in its own task via the binaryFile source.
    */
  def read(spark: SparkSession, path: String, sheetNumber: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val skipped = spark.sparkContext.longAccumulator("xls_skipped_files")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xls")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val stem = p.split('/').last.stripSuffix(".xls")
        XlsxReader.isolateFile(p, "xls", skipped) {
          parseWorkbook(bytes, sheetNumber)
            .map(c => (s"$stem!${c.sheet}", c.row, c.col, c.value))
        }
      }
      .toDF("sheet", "row", "col", "value")
  }
}
