package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ETK extraction-module contract re-expressed Spark-first
  * (SURVEY §2.11; reference em_*.py modules with document_selector +
  * process_document, docs/advanced.md:20-54).
  *
  * A module is a routing predicate plus a composable DataFrame
  * transform — not a black-box per-row UDF — so Catalyst can fuse the
  * whole module chain into one narrow projection.
  */
trait ExtractionModule {
  def name: String

  /** P14 document_selector: routing predicate (em_base.py:97-104). */
  def selector: Column

  /** process_document over the selected partition of the corpus. */
  def transform(docs: DataFrame): DataFrame
}

/** Dispatcher (SURVEY §3.2 stage 4): modules CHAIN over one document
  * stream, exactly like the reference's `process_ems` loop
  * (etk_worker.py:102-105 — every module whose selector accepts the doc
  * runs on the previous module's output) — so a document matching N
  * modules is emitted ONCE, carrying all N modules' extractions, never
  * duplicated. Docs matching no module pass through untouched.
  */
object Dispatcher {
  def run(docs: DataFrame, modules: Seq[ExtractionModule]): DataFrame =
    modules.foldLeft(docs) { (d, m) =>
      val sel = coalesce(m.selector, lit(false))
      m.transform(d.filter(sel))
        .unionByName(d.filter(!sel), allowMissingColumns = true)
    }
}
