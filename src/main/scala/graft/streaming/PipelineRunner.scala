package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Per-project pipeline lifecycle — the manager's operational surface
  * (SURVEY §3.2; reference manager.py: POST /run_etk spawns workers,
  * /kill_etk stops them, status via process grep, manager.py:70-113,
  * 135-182) re-expressed as Structured Streaming query management:
  * one named streaming query per project, restart replaces, status
  * from the query state, stop cancels.
  */
object PipelineRunner {

  final case class ProjectStatus(
      project: String, running: Boolean, batchesProcessed: Long, lastProgress: String)

  private val queries = TrieMap.empty[String, StreamingQuery]

  /** /run_etk analogue: (re)start the project's pipeline. A running
    * instance is stopped first (manager kills old workers,
    * manager.py:135-161); the checkpoint keeps offsets so no input is
    * reprocessed or lost.
    */
  def run(spark: SparkSession, project: String, inDir: String, schema: StructType,
          transform: DataFrame => DataFrame, outDir: String, checkpointDir: String)
      : StreamingQuery = synchronized {
    stop(project)
    val q = StreamPipeline.fileStream(spark, inDir, schema, transform, outDir, checkpointDir)
    queries(project) = q
    q
  }

  /** /kill_etk analogue. Returns whether something was stopped. */
  def stop(project: String): Boolean = synchronized {
    queries.remove(project) match {
      case Some(q) =>
        if (q.isActive) q.stop()
        true
      case None => false
    }
  }

  /** status analogue (manager.py:102-113 ps-grep → query state). */
  def status(project: String): Option[ProjectStatus] =
    queries.get(project).map { q =>
      ProjectStatus(
        project,
        running = q.isActive,
        batchesProcessed = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L),
        lastProgress = Option(q.lastProgress).map(_.timestamp).getOrElse(""))
    }

  def projects: Seq[String] = queries.keys.toSeq.sorted

  /** Await a project's current work (AvailableNow drains then stops). */
  def await(project: String, timeoutMs: Long): Boolean =
    queries.get(project).exists(_.awaitTermination(timeoutMs))
}
