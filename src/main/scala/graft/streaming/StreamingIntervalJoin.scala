package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-interval join (round 4) — the stream-plane twin
  * of [[graft.operators.IntervalJoin]], completing the streaming
  * story for BOTH brief-mandated time-series joins (with
  * [[StreamingAsOf]]).
  *
  * Watermark reasoning (both sides share one event-time watermark,
  * intervals stamped by their START): once the watermark passes a
  * point's timestamp, every interval that could contain it has
  * arrived — a future interval carries start > wm ≥ ts and so cannot
  * satisfy start ≤ ts. The point finalizes: it emits one row per
  * buffered containing interval (or nothing when none contains it —
  * inner-join semantics, matching the batch operator).
  *
  * State is watermark-bounded on both sides: pending points hold only
  * rows above the watermark; intervals drop as soon as end < wm (no
  * future point, all of which have ts > wm, can land inside them).
  * Unlike the as-of join no "latest below watermark" survivor is
  * needed — containment is a window, not a running last.
  */
object StreamingIntervalJoin {

  /** Tagged input: a point when isInterval = false (`ts` = endMs =
    * tsMs), an interval otherwise ([startMs, endMs] inclusive). `ts`
    * duplicates startMs as a Timestamp — the watermark column must
    * survive into the stateful operator.
    */
  final case class In(key: Long, startMs: Long, endMs: Long,
                      isInterval: Boolean, rid: Long, ts: java.sql.Timestamp)

  final case class IvState(points: Seq[(Long, Long)],
                           intervals: Seq[(Long, Long, Long)])

  final case class Out(key: Long, tsMs: Long, pointId: Long,
                       intervalId: Long, offsetMs: Long)

  private[streaming] def sweep(key: Long, newRows: Seq[In],
                               st: Option[IvState], wm: Long): (Seq[Out], IvState) = {
    val points = st.map(_.points).getOrElse(Nil) ++
      newRows.collect { case r if !r.isInterval => (r.startMs, r.rid) }
    val intervals = (st.map(_.intervals).getOrElse(Nil) ++
      newRows.collect { case r if r.isInterval => (r.startMs, r.endMs, r.rid) })
      .distinct
    val (ready, pending) = points.partition(_._1 <= wm)
    val out = for {
      (ts, pid) <- ready.sortBy(identity)
      (s, e, iid) <- intervals.sortBy(_._3) if s <= ts && ts <= e
    } yield Out(key, ts, pid, iid, ts - s)
    // an interval stays while it can still contain a future point —
    // every future point has ts > wm, so end < wm means done
    (out, IvState(pending, intervals.filter(_._2 >= wm)))
  }

  def update(key: Long, rows: Iterator[In],
             state: GroupState[IvState]): Iterator[Out] = {
    val wm = state.getCurrentWatermarkMs()
    val newRows = if (state.hasTimedOut) Nil else rows.toSeq
    val (out, ns) = sweep(key, newRows, state.getOption, wm)
    if (ns.points.isEmpty && ns.intervals.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(ns)
      if (ns.points.nonEmpty) {
        try state.setTimeoutTimestamp(ns.points.map(_._1).min)
        catch {
          case _: UnsupportedOperationException =>
          case _: IllegalStateException =>
        }
      }
    }
    out.iterator
  }

  /** Streaming entry (attach `withWatermark` on `ts` upstream). */
  def joinStream(spark: SparkSession, ds: Dataset[In]): Dataset[Out] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update)
  }

  /** Bounded/testing entry: watermark at +∞ ⇒ exactly the batch
    * [[graft.operators.IntervalJoin.joinPointInInterval]] semantics.
    */
  def boundedOf(spark: SparkSession, ds: Dataset[In]): Dataset[Out] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[In], st: GroupState[IvState]) => {
          val (out, _) = sweep(k, it.toSeq, None, Long.MaxValue)
          if (st.exists) st.remove()
          out.iterator
        })
  }
}
