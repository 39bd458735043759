package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply: the live last-writer-wins snapshot of
  * [[graft.queries.TimeSeriesQueries.cdcApply]] maintained as stream
  * state — continuous merge-into with DELETE tombstones.
  *
  * Last-writer-wins by (ts, id) is a MONOTONE max, which is what makes
  * this streaming-safe without watermark reasoning: out-of-order
  * arrivals can never un-win a later record, so any arrival order —
  * across batches, within batches — converges to the batch snapshot.
  * State per key is one record (the current winner), tombstones
  * included (a tombstone must keep winning over late stale upserts —
  * dropping the key from state would resurrect them).
  *
  * Emission on change only; downstream takes the max-(ts,id) emission
  * per key (the stream_hll convention) and filters tombstones, giving
  * exactly the batch cdc_apply output — certified against the same
  * oracle.
  */
object StreamingCdc {

  final case class In(key: Long, tsMs: Long, id: Long, op: String, value: Double)
  final case class Cur(tsMs: Long, id: Long, op: String, value: Double)
  final case class Out(key: Long, tsMs: Long, id: Long, op: String, value: Double)

  private def wins(tsMs: Long, id: Long, cur: Cur): Boolean =
    tsMs > cur.tsMs || (tsMs == cur.tsMs && id > cur.id)

  /** Per-key transition: keep the (ts, id)-max record, emit when the
    * winner changes (first record always emits).
    */
  def update(key: Long, rows: Iterator[In], state: GroupState[Cur]): Iterator[Out] = {
    val prev = state.getOption
    val best = rows.foldLeft(prev) { (acc, r) =>
      if (acc.isEmpty || wins(r.tsMs, r.id, acc.get))
        Some(Cur(r.tsMs, r.id, r.op, r.value))
      else acc
    }
    (prev, best) match {
      case (p, Some(b)) if p.forall(_ != b) =>
        state.update(b)
        Iterator.single(Out(key, b.tsMs, b.id, b.op, b.value))
      case _ => Iterator.empty
    }
  }

  /** Streaming entry: works on a streaming OR bounded change log. */
  def snapshot(spark: SparkSession, log: Dataset[In]): Dataset[Out] = {
    import spark.implicits._
    log.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update)
  }
}
