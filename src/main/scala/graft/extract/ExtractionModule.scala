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
  /** @param reliableCheckpoint use `checkpoint` (HDFS-backed, survives
    *   executor loss) instead of `localCheckpoint` for the inter-stage
    *   lineage barriers. localCheckpoint is the default for local/test
    *   runs but truncates lineage WITHOUT fault tolerance: an executor
    *   loss fails the job instead of recomputing, and the N−1 stage
    *   materializations stay pinned in executor storage for the query
    *   lifetime. On a real cluster call
    *   `spark.sparkContext.setCheckpointDir(...)` and pass true.
    */
  def run(docs: DataFrame, modules: Seq[ExtractionModule],
          reliableCheckpoint: Boolean = false): DataFrame =
    modules.zipWithIndex.foldLeft(docs) { case (d, (m, i)) =>
      // Lineage barrier between module stages: the fold references `d`
      // in BOTH branches (matched + passthrough), so without truncation
      // module k's plan embeds two copies of module k-1's — 2^N source
      // scans for N modules. The checkpoint materializes each stage
      // once (the reference also processes stage-by-stage per doc);
      // lazy, so no job runs until the pipeline's own action, and the
      // last stage needs no barrier.
      val sel = coalesce(m.selector, lit(false))
      val staged = m.transform(d.filter(sel))
        .unionByName(d.filter(!sel), allowMissingColumns = true)
      if (i < modules.size - 1) {
        if (reliableCheckpoint) staged.checkpoint(false)
        else staged.localCheckpoint(false)
      } else staged
    }
}
