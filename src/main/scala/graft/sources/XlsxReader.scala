package graft.sources

import java.io.InputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3 XLS/XLSX source (SURVEY §2.1; reference uses pyexcel,
  * dig_tabular_import.py:107-110,133-137). JDK-only implementation —
  * .xlsx is a zip of SpreadsheetML parts, read with java.util.zip +
  * StAX; no external codec.
  *
  * Produces the engine-neutral cell grid (sheet, row, col, value) that
  * `SpreadsheetRegions` consumes, so annotated region extraction (S4)
  * runs directly on real workbooks. Distribution model: one task per
  * workbook via the binaryFile source + flatMap — workbooks are small
  * relative to partitions; the parallel axis is the number of files.
  */
object XlsxReader {

  /** Hardened StAX factory shared by every parser: DTDs and external
    * entities disabled — a crafted workbook part with a billion-laughs
    * DOCTYPE would otherwise OOM the executor (and external entities
    * could reach out of the sandbox).
    */
  private def xmlReader(in: InputStream): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  final case class Cell(sheet: String, row: Int, col: Int, value: String)

  /** Per-file fault isolation shared by both workbook readers: a
    * malformed file logs, increments a DRIVER-VISIBLE accumulator
    * (named `<tag>_skipped_files` in the Spark UI/metrics — stderr on
    * an executor alone would let whole workbooks vanish silently), and
    * is skipped instead of failing the multi-file job.
    */
  private[sources] def isolateFile[T](path: String, tag: String,
      skipped: org.apache.spark.util.LongAccumulator)(body: => Seq[T]): Seq[T] =
    try body catch {
      case e: Exception =>
        skipped.add(1)
        System.err.println(s"[$tag] skipping $path: ${e.getMessage}")
        Seq.empty
    }

  /** Column letters → 0-based index ("A"->0, "AA"->26). */
  def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  def rowIndex(ref: String): Int = ref.dropWhile(_.isLetter).toInt - 1

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val out = ArrayBuffer[String]()
    val r = xmlReader(in)
    var cur: StringBuilder = null
    var inT = false
    // <rPh> phonetic-hint runs carry their own <t> (furigana) that must
    // NOT concatenate into the cell text
    var inRPh = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "rPh" => inRPh = true
            case "t" if !inRPh => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "rPh" => inRPh = false
            case "t" => inT = false
            case "si" => out += cur.toString; cur = null
            case _ =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  private def parseSheet(in: InputStream, sheetName: String,
                         shared: IndexedSeq[String]): Seq[Cell] = {
    val out = ArrayBuffer[Cell]()
    val r = xmlReader(in)
    var cellRef: String = null
    var cellType: String = null
    var inV = false
    val v = new StringBuilder
    // inlineStr cells may hold MULTIPLE rich-text runs
    // (<is><r><t>a</t></r><r><t>b</t></r></is>) — runs accumulate here
    // and emit ONE concatenated Cell on </c>, never one Cell per run.
    // <rPh> phonetic runs inside <is> are skipped (furigana, not text).
    val inlineAcc = new StringBuilder
    var inlineRuns = 0
    var inRPh = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "c" =>
              cellRef = r.getAttributeValue(null, "r")
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              inlineAcc.setLength(0); inlineRuns = 0
            case "rPh" => inRPh = true
            case "v" | "t" if cellRef != null && !inRPh =>
              inV = true; v.setLength(0)
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV =>
          v.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "rPh" => inRPh = false
            case "v" | "t" if inV =>
              inV = false
              if (cellRef != null) {
                if (cellType == "inlineStr") {
                  inlineAcc.append(v); inlineRuns += 1
                } else {
                  val value = cellType match {
                    case "s" => shared.lift(v.toString.trim.toInt).getOrElse("")
                    case _ => v.toString
                  }
                  out += Cell(sheetName, rowIndex(cellRef), colIndex(cellRef), value)
                  cellRef = null
                }
              }
            case "c" =>
              if (cellRef != null && cellType == "inlineStr" && inlineRuns > 0)
                out += Cell(sheetName, rowIndex(cellRef), colIndex(cellRef), inlineAcc.toString)
              cellRef = null
            case _ =>
          }
        case _ =>
      }
    }
    out.toSeq
  }

  /** Book order + real tab names from xl/workbook.xml: <sheet name=
    * "Inventory" r:id="rId2"/> in tab order.
    */
  private def parseWorkbookXml(bytes: Array[Byte]): Seq[(String, String)] = {
    val out = ArrayBuffer[(String, String)]()
    val r = xmlReader(new java.io.ByteArrayInputStream(bytes))
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
        val nm = Option(r.getAttributeValue(null, "name")).getOrElse("")
        // r:id is namespaced; scan attributes for local name "id"
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue).getOrElse("")
        out += ((nm, rid))
      }
    }
    out.toSeq
  }

  /** rId → part target from xl/_rels/workbook.xml.rels. */
  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val out = scala.collection.mutable.Map[String, String]()
    val r = xmlReader(new java.io.ByteArrayInputStream(bytes))
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
        val id = Option(r.getAttributeValue(null, "Id")).getOrElse("")
        val target = Option(r.getAttributeValue(null, "Target")).getOrElse("")
        if (id.nonEmpty) out(id) = target
      }
    }
    out.toMap
  }

  /** Parse one workbook's bytes → cells of the `sheetNumber`-th sheet
    * (1-based, matching the reference's sheet_number) or all sheets.
    *
    * Sheet ORDER and NAMES follow xl/workbook.xml + its rels when
    * present — part filenames (sheetN.xml) don't track tab order once
    * sheets are deleted/reordered, and real tab names keep .xlsx and
    * .xls (BOUNDSHEET) outputs consistent for the same workbook. Files
    * without workbook.xml (minimal fixtures) fall back to numeric part
    * order with synthetic names.
    */
  def parseWorkbook(bytes: Array[Byte], sheetNumber: Option[Int] = None): Seq[Cell] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var workbookXml: Option[Array[Byte]] = None
    var relsXml: Option[Array[Byte]] = None
    val sheets = ArrayBuffer[(String, Array[Byte])]()
    var e = zin.getNextEntry
    while (e != null) {
      val name = e.getName
      if (name == "xl/sharedStrings.xml" || name == "xl/workbook.xml" ||
          name == "xl/_rels/workbook.xml.rels" ||
          name.matches("xl/worksheets/sheet\\d+\\.xml")) {
        val buf = new java.io.ByteArrayOutputStream()
        zin.transferTo(buf)
        name match {
          case "xl/sharedStrings.xml" =>
            shared = parseSharedStrings(new java.io.ByteArrayInputStream(buf.toByteArray))
          case "xl/workbook.xml" => workbookXml = Some(buf.toByteArray)
          case "xl/_rels/workbook.xml.rels" => relsXml = Some(buf.toByteArray)
          case _ => sheets += ((name, buf.toByteArray))
        }
      }
      e = zin.getNextEntry
    }
    val byPart = sheets.toMap
    val ordered: Seq[(String, Array[Byte])] = (workbookXml, relsXml) match {
      case (Some(wb), Some(rl)) =>
        val rels = parseRels(rl)
        // normalize the rel Target forms generators emit: leading "/",
        // "./", with or without the "xl/" prefix
        def resolve(t: String): Option[Array[Byte]] = {
          val clean = t.stripPrefix("/").stripPrefix("./")
            .stripPrefix("xl/")
          byPart.get("xl/" + clean)
        }
        // consider only WORKSHEET entries: chartsheets/macrosheets are
        // listed in <sheets> too but their parts live outside
        // xl/worksheets/ (we'd otherwise always fall back for any
        // workbook containing a chart tab)
        val wsEntries = parseWorkbookXml(wb).filter { case (_, rid) =>
          rels.get(rid).exists(_.contains("worksheets/"))
        }
        val resolved = wsEntries.flatMap { case (nm, rid) =>
          rels.get(rid).flatMap(resolve).map(bs => (nm, bs))
        }
        // every worksheet ENTRY must resolve or we fall back — the zip
        // part count is the wrong denominator (orphan parts left by
        // sheet deletion would discard a good mapping)
        if (resolved.size == wsEntries.size && wsEntries.nonEmpty) resolved
        else Seq.empty
      case _ => Seq.empty
    }
    // single shared fallback: numeric part order with synthetic names
    val effective =
      if (ordered.nonEmpty) ordered
      else sheets.sortBy { case (n, _) =>
        "\\d+".r.findFirstIn(n).map(_.toInt).getOrElse(0)
      }.map { case (n, bs) =>
        ("sheet" + "\\d+".r.findFirstIn(n).getOrElse("1"), bs)
      }.toSeq
    val picked = sheetNumber match {
      case Some(i) => effective.slice(i - 1, i)
      case None => effective
    }
    picked.flatMap { case (sheetName, bs) =>
      parseSheet(new java.io.ByteArrayInputStream(bs), sheetName, shared)
    }
  }

  /** Distributed read: every .xlsx under `path` → one cell-grid frame.
    * binaryFile source gives (path, bytes); each workbook parses in its
    * own task.
    */
  def read(spark: SparkSession, path: String, sheetNumber: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val skipped = spark.sparkContext.longAccumulator("xlsx_skipped_files")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val stem = p.split('/').last.stripSuffix(".xlsx")
        isolateFile(p, "xlsx", skipped) {
          parseWorkbook(bytes, sheetNumber)
            .map(c => (s"$stem!${c.sheet}", c.row, c.col, c.value))
        }
      }
      .toDF("sheet", "row", "col", "value")
  }
}
