package graft.ts

import graft.SparkSpec

class SpreadsheetRegionsSpec extends SparkSpec {
  import spark.implicits._
  import SpreadsheetRegions._

  // A sheet laid out like the reference's annotated spreadsheets:
  // row 0: header labels; col 0: years; col 1: values; blank ends region.
  private def cells = Seq(
    ("s1", 0, 0, "year"), ("s1", 0, 1, "gdp"),
    ("s1", 1, 0, "2001"), ("s1", 1, 1, "10"),
    ("s1", 2, 0, "2002"), ("s1", 2, 1, "11"),
    ("s1", 3, 0, "2003"), ("s1", 3, 1, "12"),
    ("s1", 4, 0, ""), ("s1", 4, 1, "99")) // blank year ends infinite range
    .toDF("sheet", "row", "col", "value")

  test("location parsing: A1, [B:3], wildcards, whole col/row") {
    assert(parseLoc("A1") == Loc(Some(0), Some(0)))
    assert(parseLoc("[B:3]") == Loc(Some(1), Some(2)))
    assert(parseLoc("C") == Loc(Some(2), None))
    assert(parseLoc("4") == Loc(None, Some(3)))
    assert(parseLoc("*") == Loc(None, None))
    assert(parseLoc("AA1") == Loc(Some(26), Some(0)))
  }

  test("range parsing: bare and bracketed forms") {
    assert(parseRange("A1:B3") == Range(Loc(Some(0), Some(0)), Loc(Some(1), Some(2))))
    assert(parseRange("[B:2]:[B:*]") == Range(Loc(Some(1), Some(1)), Loc(Some(1), None)))
  }

  test("finite region filters by rectangle") {
    val r = region(cells, parseRange("A2:B3"))
    assert(r.count() == 4)
  }

  test("infinite range stops at first blank") {
    val r = region(cells, parseRange("[A:2]:[A:*]"))
    assert(r.select("value").as[String].collect().sorted.toSeq == Seq("2001", "2002", "2003"))
  }

  test("infinite rightward range stops at first blank (row orientation)") {
    val rowCells = Seq(
      ("s1", 0, 0, "2001"), ("s1", 0, 1, "2002"), ("s1", 0, 2, ""), ("s1", 0, 3, "2004"))
      .toDF("sheet", "row", "col", "value")
    val r = region(rowCells, parseRange("[A:1]:[*:1]"))
    assert(r.select("value").as[String].collect().sorted.toSeq == Seq("2001", "2002"))
  }

  test("timeSeries joins time and value ranges positionally") {
    val ts = timeSeries(cells,
      times = parseRange("[A:2]:[A:*]"),
      values = parseRange("[B:2]:[B:4]"),
      rowOriented = false)
    val rows = ts.select("time_label", "value").as[(String, String)].collect()
    assert(rows.toSeq == Seq(("2001", "10"), ("2002", "11"), ("2003", "12")))
  }
}
