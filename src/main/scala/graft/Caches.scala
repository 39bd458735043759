package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Storage-block hygiene for iterative plans and long-lived sessions.
  *
  * `localCheckpoint(eager = true)` is the lineage barrier every iterative
  * operator here uses (pagerank/BFS/SSSP/labelprop/clusters), but the
  * blocks it pins live until the RDD is garbage-collected or the session
  * ends — on a long-lived session (or a bench harness running 160+
  * queries back to back) iteration-N blocks accrete without bound and
  * evict genuinely hot data. Two remedies, both used:
  *
  *   - inside a loop, [[free]] iteration N's blocks as soon as iteration
  *     N+1 has materialized (the new checkpoint no longer references the
  *     old one, so the blocks are dead weight);
  *   - between independent units of work, [[sweep]] everything except a
  *     caller-supplied keep-set (the session-scoped indexes: kg_build,
  *     graph_build).
  */
object Caches {

  /** Free the storage blocks behind a `localCheckpoint`ed (or otherwise
    * RDD-backed) DataFrame. Safe only once nothing will read the frame
    * again — a checkpointed RDD cannot recompute evicted blocks.
    * No-op for plans that are not RDD-backed.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Snapshot the ids of every currently-persisted RDD — call after
    * building session-scoped indexes to form the keep-set for [[sweep]].
    */
  def persistentIds(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Drop every cache-manager entry and every persisted/checkpointed RDD
    * whose id is not in `keep`. The keep-set protects session-scoped
    * indexes (which live as localCheckpoint blocks, untouched by
    * `clearCache`); everything else — per-query `.cache()` barriers and
    * loop checkpoints that escaped their query — is freed.
    */
  def sweep(spark: SparkSession, keep: Set[Int]): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keep.contains(id)) rdd.unpersist(blocking = false)
    }
  }
}
