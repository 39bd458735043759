package graft.sources

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.ts.SpreadsheetRegions

class XlsxReaderSpec extends SparkSpec {
  import spark.implicits._

  /** Build a minimal real .xlsx (zip of SpreadsheetML) in-memory. */
  private def makeXlsx(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>year</t></si><si><t>gdp</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>2001</v></c><c r="B2"><v>10</v></c></row>
        |<row r="3"><c r="A3"><v>2002</v></c><c r="B3"><v>11</v></c></row>
        |<row r="4"><c r="A4"><v>2003</v></c><c r="B4"><v>12</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  test("parseWorkbook reads shared strings, numerics, sheet selection") {
    val cells = XlsxReader.parseWorkbook(makeXlsx(), sheetNumber = Some(1))
    assert(cells.size == 8)
    assert(cells.find(c => c.row == 0 && c.col == 0).get.value == "year")
    assert(cells.find(c => c.row == 1 && c.col == 1).get.value == "10")
    val all = XlsxReader.parseWorkbook(makeXlsx(), sheetNumber = None)
    assert(all.map(_.sheet).distinct.sorted == Seq("sheet1", "sheet2"))
  }

  test("distributed read -> cell grid -> S4 region time-series extraction") {
    val dir = Files.createTempDirectory("xlsx").toString
    Files.write(java.nio.file.Paths.get(s"$dir/gdp.xlsx"), makeXlsx())
    val grid = XlsxReader.read(spark, dir, sheetNumber = Some(1))
    assert(grid.count() == 8)
    val ts = SpreadsheetRegions.timeSeries(grid,
      times = SpreadsheetRegions.parseRange("[A:2]:[A:*]"),
      values = SpreadsheetRegions.parseRange("[B:2]:[B:4]"),
      rowOriented = false)
    assert(ts.select("time_label", "value").as[(String, String)].collect().toSeq ==
      Seq(("2001", "10"), ("2002", "11"), ("2003", "12")))
  }

  test("inlineStr cells: multi-run rich text concatenates into ONE cell") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><r><t>Hello </t></r><r><t>World</t></r></is></c>
        |<c r="B1" t="inlineStr"><is><t>plain</t></is></c>
        |<c r="C1"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin.getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    val cells = XlsxReader.parseWorkbook(bos.toByteArray, sheetNumber = Some(1))
    assert(cells.size == 3)
    assert(cells.find(c => c.row == 0 && c.col == 0).get.value == "Hello World")
    assert(cells.find(c => c.row == 0 && c.col == 1).get.value == "plain")
    assert(cells.find(c => c.row == 0 && c.col == 2).get.value == "42")
  }

  test("workbook.xml drives sheet order and real tab names") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    // tab order: Inventory (part sheet3!) first, then Totals (sheet1)
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns:r="http://x/rels"><sheets>
        |<sheet name="Inventory" sheetId="1" r:id="rId9"/>
        |<sheet name="Totals" sheetId="2" r:id="rId4"/>
        |</sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId9" Target="worksheets/sheet3.xml"/>
        |<Relationship Id="rId4" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row r="1"><c r="A1"><v>100</v></c></row></sheetData></worksheet>""")
    put("xl/worksheets/sheet3.xml",
      """<worksheet><sheetData><row r="1"><c r="A1"><v>7</v></c></row></sheetData></worksheet>""")
    z.close()
    val all = XlsxReader.parseWorkbook(bos.toByteArray)
    assert(all.map(_.sheet).distinct == Seq("Inventory", "Totals"))
    // sheet_number=1 follows BOOK order (Inventory = part sheet3)
    val first = XlsxReader.parseWorkbook(bos.toByteArray, sheetNumber = Some(1))
    assert(first.map(c => (c.sheet, c.value)) == Seq(("Inventory", "7")))
  }

  test("rPh phonetic runs are excluded from shared strings and inlineStr") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><r><t>Kanji</t></r>
        |<rPh sb="0" eb="2"><t>furigana</t></rPh></si></sst>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c>
        |<c r="B1" t="inlineStr"><is><r><t>base</t></r>
        |<rPh sb="0" eb="1"><t>hint</t></rPh></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val cells = XlsxReader.parseWorkbook(bos.toByteArray, sheetNumber = Some(1))
    assert(cells.find(c => c.col == 0).get.value == "Kanji")
    assert(cells.find(c => c.col == 1).get.value == "base")
  }

  test("column reference arithmetic") {
    assert(XlsxReader.colIndex("A1") == 0)
    assert(XlsxReader.colIndex("AA10") == 26)
    assert(XlsxReader.rowIndex("AA10") == 9)
  }
}
