package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S4 spreadsheet region source (SURVEY §2.1; reference
  * `utilities/timeseries/extractSpreadsheet.py:20-311`,
  * `LocationParser.py:13-75`, `LocationRange.py:8-70`).
  *
  * Input is the engine-neutral cell grid `Dataset[Cell]`
  * (sheet, row, col, value) — produced by any tabular reader (the
  * reference uses pyexcel; a POI-based XLS reader slots in here, and the
  * cell-grid contract means the region algebra is testable without one).
  * Regions are annotation-driven: Excel-style ranges with `*` wildcards,
  * row/col orientation, metadata from const/cell/row/col/sheet-name
  * sources, infinite ranges stopping at the first blank.
  */
object SpreadsheetRegions {

  /** Parsed Excel-style location: `[B:3]` → (col 1, row 2); `*` → None
    * (infinite / wildcard), matching LocationParser.py's range algebra.
    */
  final case class Loc(col: Option[Int], row: Option[Int])

  final case class Range(start: Loc, end: Loc)

  /** Parse "B3", "[B:3]", "B" (whole column), "3" (whole row), "*",
    * "[B:*]" (column B, any row).
    */
  def parseLoc(s: String): Loc = {
    def colOf(tok: String): Option[Int] =
      if (tok.isEmpty || tok == "*") None
      else Some(tok.toUpperCase.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1)
    def rowOf(tok: String): Option[Int] =
      if (tok.isEmpty || tok == "*") None else Some(tok.toInt - 1)
    val t = s.trim
    if (t == "*" || t.isEmpty) Loc(None, None)
    else if (t.startsWith("[")) {
      t.stripPrefix("[").stripSuffix("]").split(":", 2) match {
        case Array(c, r) => Loc(colOf(c.trim), rowOf(r.trim))
        case Array(c) => Loc(colOf(c.trim), None)
      }
    } else {
      "^([A-Za-z]*)([0-9]*)$".r.findFirstMatchIn(t) match {
        case Some(g) => Loc(colOf(g.group(1)), rowOf(g.group(2)))
        case None => Loc(None, None)
      }
    }
  }

  /** Parse "A1:C9" / "[B:2]:[B:*]" / single-location "[B:3]" / "A1"
    * range strings.
    */
  def parseRange(s: String): Range = {
    val t = s.trim
    // split on the ':' separating two bracketed or bare locs; bracketed
    // locs contain ':' themselves, so split between "]:"/":[" first —
    // and a lone bracketed loc ("[B:3]") must NOT split on its inner ':'
    val parts =
      if (t.contains("]:")) t.split("\\]:", 2).toSeq match {
        case Seq(a, b) => Seq(a + "]", b)
      }
      else if (t.startsWith("[")) Seq(t)
      else t.split(":", 2).toSeq
    parts match {
      case Seq(a, b) => Range(parseLoc(a), parseLoc(b))
      case Seq(a) => val l = parseLoc(a); Range(l, l)
    }
  }

  /** Filter the cell grid to a range; infinite edges stop at the first
    * blank value along the orientation (extractSpreadsheet.py's
    * "infinite ranges stop at blank" semantics).
    */
  def region(cells: DataFrame, range: Range): DataFrame = {
    var out = cells
    range.start.col.foreach(c => out = out.filter(col("col") >= c))
    range.end.col.foreach(c => out = out.filter(col("col") <= c))
    range.start.row.foreach(r => out = out.filter(col("row") >= r))
    range.end.row.foreach(r => out = out.filter(col("row") <= r))
    def stopAtBlank(df: DataFrame, partAxis: String, walkAxis: String): DataFrame = {
      val w = Window.partitionBy(col("sheet"), col(partAxis)).orderBy(col(walkAxis))
      df.withColumn("__blank",
          sum(when(col("value").isNull || trim(col("value")) === "", 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("__blank") === 0).drop("__blank")
    }
    if (range.end.row.isEmpty && range.start.row.nonEmpty)
      out = stopAtBlank(out, "col", "row") // infinite downward
    if (range.end.col.isEmpty && range.start.col.nonEmpty)
      out = stopAtBlank(out, "row", "col") // infinite rightward (row-oriented sheets)
    out
  }

  /** Extract a time-series region: times along one range, values along
    * another, joined positionally by the orientation axis
    * (extractSpreadsheet.py:174-190 emits {metadata, ts:[[label,value]]}).
    */
  def timeSeries(cells: DataFrame, times: Range, values: Range,
                 rowOriented: Boolean): DataFrame = {
    val axis = if (rowOriented) "col" else "row"
    val t = region(cells, times).select(col(axis).as("__k"), col("value").as("time_label"))
    val v = region(cells, values).select(col(axis).as("__k"), col("value").as("value"))
    t.join(v, "__k").withColumnRenamed("__k", "pos").orderBy(col("pos"))
  }

  /** Metadata sources with a fixed value per extraction
    * (extractSpreadsheet.py metadata modes): const / cell(loc) /
    * sheet_name. Per-series row/col sources are positional — use
    * [[rangeMetadata]] — and are rejected here rather than silently
    * emitted as constant spec strings.
    */
  def metadata(cells: DataFrame, spec: Map[String, String]): Map[String, Column] =
    spec.map {
      case (k, v) if v.startsWith("cell:") =>
        val loc = parseLoc(v.stripPrefix("cell:"))
        k -> first(when(col("row") === loc.row.getOrElse(0) &&
          col("col") === loc.col.getOrElse(0), col("value")), ignoreNulls = true)
      case (k, v) if v == "sheet_name" => k -> first(col("sheet"))
      case (k, v) if v.startsWith("row:") || v.startsWith("col:") =>
        throw new IllegalArgumentException(
          s"metadata '$k': per-series $v sources are positional — use rangeMetadata")
      case (k, v) => k -> lit(v.stripPrefix("const:"))
    }

  /** Per-series row/col metadata source (extractSpreadsheet.py:72-80):
    * the values of the metadata row/col segment aligned with the
    * series, space-joined in axis order (the reference's
    * `" ".join(md_vals)`). Returns the joined string.
    */
  def rangeMetadata(cells: DataFrame, mdRange: Range, rowOriented: Boolean): String = {
    val axis = if (rowOriented) "col" else "row"
    region(cells, mdRange)
      .agg(concat_ws(" ",
        transform(sort_array(collect_list(struct(col(axis), col("value")))),
          p => p.getField("value"))).as("md"))
      .head().getString(0)
  }
}
