package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Builds a real BIFF8 .xls byte-for-byte from the public [MS-CFB] +
  * [MS-XLS] layouts (no xls writer exists in this container) and reads
  * it back: CFB mini-stream resolution, BOUNDSHEET/SST globals, and the
  * LABELSST / LABEL / NUMBER / RK / MULRK cell records.
  */
/** Shared BIFF/CFB byte builders for the reader specs. */
object BiffFixture {
  class LE {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): LE = { out.write(v & 0xff); this }
    def u16(v: Int): LE = { u8(v); u8(v >> 8) }
    def u32(v: Int): LE = { u16(v); u16(v >> 16) }
    def f64(v: Double): LE = {
      val bits = java.lang.Double.doubleToLongBits(v)
      u32((bits & 0xFFFFFFFFL).toInt); u32((bits >>> 32).toInt)
    }
    def ascii(s: String): LE = { out.write(s.getBytes("US-ASCII")); this }
    def utf16(s: String): LE = { out.write(s.getBytes("UTF-16LE")); this }
    def pad(to: Int): LE = { while (out.size < to) u8(0); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  def rec(typ: Int, payload: LE): Array[Byte] = {
    val b = payload.bytes
    val r = new LE; r.u16(typ); r.u16(b.length); r.out.write(b); r.bytes
  }

  /** Wrap a small (< 4096 byte) stream as a CFB compound document with
    * the stream in the mini-stream — the layout Excel/pyexcel produce
    * for small workbooks. Sectors: 0=FAT, 1=directory, 2=miniFAT,
    * 3=mini-stream container.
    */
  def cfb(stream: Array[Byte]): Array[Byte] = {
    require(stream.length <= 512)
    val EndOfChain = 0xFFFFFFFE; val FreeSect = 0xFFFFFFFF; val FatSect = 0xFFFFFFFD
    val nMini = (stream.length + 63) / 64
    val h = new LE
    h.u32(0xE011CFD0).u32(0xE11AB1A1) // signature
    h.pad(24).u16(0x3E).u16(0x03).u16(0xFFFE) // minor/major/byte order
    h.u16(9).u16(6) // sector shift 512 / mini shift 64
    h.pad(44).u32(1) // one FAT sector
    h.u32(1) // first directory sector
    h.u32(0).u32(4096) // txn sig, mini cutoff
    h.u32(2).u32(1) // first miniFAT sector, count
    h.u32(EndOfChain).u32(0) // no DIFAT sectors
    h.u32(0) // DIFAT[0] -> FAT in sector 0
    for (_ <- 1 until 109) h.u32(FreeSect)
    assert(h.bytes.length == 512)

    val fat = new LE
    fat.u32(FatSect).u32(EndOfChain).u32(EndOfChain).u32(EndOfChain)
    for (_ <- 4 until 128) fat.u32(FreeSect)

    def dirEntry(name: String, typ: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val e = new LE
      e.utf16(name).pad(64)
      e.u16(if (name.isEmpty) 0 else (name.length + 1) * 2)
      e.u8(typ).u8(1) // object type, black
      e.u32(FreeSect).u32(FreeSect).u32(child) // siblings, child
      e.pad(116).u32(start).u32(size).u32(0)
      val b = e.bytes; assert(b.length == 128); b
    }
    val dir = dirEntry("Root Entry", 5, 1, 3, 512) ++
      dirEntry("Workbook", 2, FreeSect, 0, stream.length) ++
      dirEntry("", 0, FreeSect, 0, 0) ++ dirEntry("", 0, FreeSect, 0, 0)

    val miniFat = new LE
    for (i <- 0 until nMini) miniFat.u32(if (i == nMini - 1) EndOfChain else i + 1)
    for (_ <- nMini until 128) miniFat.u32(FreeSect)

    val miniStream = new LE
    miniStream.out.write(stream); miniStream.pad(512)

    h.bytes ++ fat.bytes ++ dir ++ miniFat.bytes ++ miniStream.bytes
  }
}

class XlsReaderSpec extends SparkSpec {
  import spark.implicits._
  import BiffFixture.{LE, rec, cfb}

  /** Assemble the BIFF8 Workbook stream: globals (BOF, SST, 2x
    * BOUNDSHEET, EOF) + two sheet substreams.
    */
  private def biffStream(): Array[Byte] = {
    def bof(dt: Int) = rec(0x809, new LE().u16(0x0600).u16(dt).u16(0).u16(0).u32(0).u32(0))
    val sst = rec(0xFC, {
      val l = new LE().u32(2).u32(2)
      l.u16(4).u8(0).ascii("year")
      l.u16(3).u8(0).ascii("gdp")
      l
    })
    def labelSst(row: Int, col: Int, idx: Int) =
      rec(0xFD, new LE().u16(row).u16(col).u16(0).u32(idx))
    def number(row: Int, col: Int, v: Double) =
      rec(0x203, new LE().u16(row).u16(col).u16(0).f64(v))
    def rkInt(v: Int): Int = (v << 2) | 0x02
    val eof = rec(0x0A, new LE())

    val sheet1 = bof(0x0010) ++ labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
      number(1, 0, 2001.0) ++
      rec(0x27E, new LE().u16(1).u16(1).u16(0).u32(rkInt(10))) ++ // RK
      rec(0xBD, new LE().u16(2).u16(0) // MULRK: 2002, 11 in cols 0-1
        .u16(0).u32(rkInt(2002)).u16(0).u32(rkInt(11)).u16(1)) ++
      rec(0x204, new LE().u16(3).u16(0).u16(0).u16(4).u8(0).ascii("note")) ++ // LABEL
      eof
    val sheet2 = bof(0x0010) ++ number(0, 0, 3.5) ++ eof

    def boundsheet(pos: Int, name: String) =
      rec(0x85, new LE().u32(pos).u16(0).u8(name.length).u8(0).ascii(name))
    // globals length depends only on name lengths -> compute with
    // placeholder positions, then rebuild with real offsets
    def globals(p1: Int, p2: Int) =
      bof(0x0005) ++ sst ++ boundsheet(p1, "data") ++ boundsheet(p2, "extra") ++ eof
    val gLen = globals(0, 0).length
    globals(gLen, gLen + sheet1.length) ++ sheet1 ++ sheet2
  }

  private def makeXls(): Array[Byte] = cfb(biffStream())

  test("BIFF8 workbook parses: SST labels, NUMBER, RK, MULRK, LABEL, sheet names") {
    val cells = XlsReader.parseWorkbook(makeXls())
    val bySheet = cells.groupBy(_.sheet)
    assert(bySheet.keySet == Set("data", "extra"))
    val grid = bySheet("data").map(c => (c.row, c.col) -> c.value).toMap
    assert(grid((0, 0)) == "year" && grid((0, 1)) == "gdp")
    assert(grid((1, 0)) == "2001") // NUMBER, integral -> no ".0"
    assert(grid((1, 1)) == "10") // RK int
    assert(grid((2, 0)) == "2002" && grid((2, 1)) == "11") // MULRK
    assert(grid((3, 0)) == "note") // inline LABEL
    assert(bySheet("extra").head.value == "3.5") // non-integral NUMBER
  }

  /** BIFF5 (Excel 5.0/95) workbook stream: BOF vers 0x0500, ANSI
    * BOUNDSHEET names (no option-flags byte), inline LABEL with ANSI
    * byte strings, no SST — the pre-97 record shapes.
    */
  private def biff5Stream(): Array[Byte] = {
    def bof(dt: Int) = rec(0x809, new LE().u16(0x0500).u16(dt).u16(0).u16(0))
    def number(row: Int, col: Int, v: Double) =
      rec(0x203, new LE().u16(row).u16(col).u16(0).f64(v))
    def label(row: Int, col: Int, txt: String) =
      rec(0x204, new LE().u16(row).u16(col).u16(0).u16(txt.length).ascii(txt))
    def rkInt(v: Int): Int = (v << 2) | 0x02
    val eof = rec(0x0A, new LE())
    val sheet = bof(0x0010) ++
      label(0, 0, "year") ++ label(0, 1, "gdp") ++
      number(1, 0, 1995.0) ++
      rec(0x27E, new LE().u16(1).u16(1).u16(0).u32(rkInt(7))) ++
      rec(0xBD, new LE().u16(2).u16(0)
        .u16(0).u32(rkInt(1996)).u16(0).u32(rkInt(8)).u16(1)) ++
      eof
    def boundsheet(pos: Int, name: String) =
      rec(0x85, new LE().u32(pos).u16(0).u8(name.length).ascii(name))
    def globals(p1: Int) = bof(0x0005) ++ boundsheet(p1, "legacy") ++ eof
    val gLen = globals(0).length
    globals(gLen) ++ sheet
  }

  test("BIFF5 workbook parses through the BOF version dispatch: ANSI labels, NUMBER, RK, MULRK") {
    val cells = XlsReader.parseWorkbook(cfb(biff5Stream()))
    assert(cells.map(_.sheet).toSet == Set("legacy"))
    val grid = cells.map(c => (c.row, c.col) -> c.value).toMap
    assert(grid((0, 0)) == "year" && grid((0, 1)) == "gdp")
    assert(grid((1, 0)) == "1995" && grid((1, 1)) == "7")
    assert(grid((2, 0)) == "1996" && grid((2, 1)) == "8")
    assert(cells.size == 6)
  }

  test("sheet_number selection is 1-based, matching dig_tabular_import") {
    val only1 = XlsReader.parseWorkbook(makeXls(), sheetNumber = Some(1))
    assert(only1.nonEmpty && only1.forall(_.sheet == "data"))
    val only2 = XlsReader.parseWorkbook(makeXls(), sheetNumber = Some(2))
    assert(only2.map(_.value) == Seq("3.5"))
  }

  test("distributed read produces the same cell grid as the xlsx path") {
    val dir = Files.createTempDirectory("xls").toString
    Files.write(java.nio.file.Paths.get(s"$dir/gdp.xls"), makeXls())
    val grid = XlsReader.read(spark, dir, sheetNumber = Some(1))
    assert(grid.count() == 7)
    val r = grid.filter($"row" === 1).orderBy($"col")
      .select("value").as[String].collect().toSeq
    assert(r == Seq("2001", "10"))
    assert(grid.select("sheet").distinct().as[String].collect().head == "gdp!data")
  }

  test("SST split across CONTINUE mid-string with an encoding switch") {
    def bof(dt: Int) = rec(0x809, new LE().u16(0x0600).u16(dt).u16(0).u16(0).u32(0).u32(0))
    val eof = rec(0x0A, new LE())
    // SST: 2 strings; string 0 "hello worl" (cch=10) has 6 compressed
    // chars in the SST record, then the CONTINUE starts with option
    // byte 0x01 and the last 4 chars in UTF-16LE; string 1 "gdp"
    // follows inside the CONTINUE with its own header (no flag byte).
    val sstRec = rec(0xFC, new LE().u32(2).u32(2).u16(10).u8(0).ascii("hello "))
    val contRec = rec(0x3C, new LE().u8(1).utf16("worl").u16(3).u8(0).ascii("gdp"))
    def boundsheet(pos: Int, name: String) =
      rec(0x85, new LE().u32(pos).u16(0).u8(name.length).u8(0).ascii(name))
    def labelSst(row: Int, col: Int, idx: Int) =
      rec(0xFD, new LE().u16(row).u16(col).u16(0).u32(idx))
    val sheet = bof(0x0010) ++ labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ eof
    def globals(p1: Int) = bof(0x0005) ++ sstRec ++ contRec ++ boundsheet(p1, "s") ++ eof
    val stream = globals(globals(0).length) ++ sheet
    val cells = XlsReader.parseWorkbook(cfb(stream))
    val grid = cells.map(c => (c.row, c.col) -> c.value).toMap
    assert(grid((0, 0)) == "hello worl")
    assert(grid((0, 1)) == "gdp")
  }

  test("RK decoding: int, x100 scaling, truncated double") {
    assert(XlsReader.decodeRk((42 << 2) | 0x02) == 42.0)
    assert(XlsReader.decodeRk((4200 << 2) | 0x03) == 42.0) // int / 100
    val bits = java.lang.Double.doubleToLongBits(1.5)
    assert(XlsReader.decodeRk(((bits >>> 32) & 0xFFFFFFFCL).toInt) == 1.5)
  }
}
