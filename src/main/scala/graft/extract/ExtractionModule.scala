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

/** Dispatcher (SURVEY §3.2 stage 4): each module processes the docs its
  * selector accepts; non-matching docs pass through untouched. Output
  * unioned by name (the reference's implicit multi-dataset union, §2.8).
  */
object Dispatcher {
  def run(docs: DataFrame, modules: Seq[ExtractionModule]): DataFrame = {
    val processed = modules.map(m => m.transform(docs.filter(m.selector)))
    val anySelector = modules.map(_.selector).reduce(_ || _)
    val passthrough = docs.filter(!coalesce(anySelector, lit(false)))
    (processed :+ passthrough).reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
