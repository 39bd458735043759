package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-legal backward as-of join (round 4) — the stream-plane
  * twin of [[graft.operators.AsOf.joinBackward]], whose
  * unbounded-preceding window Structured Streaming rejects.
  *
  * Shape: both sides arrive as ONE merged stream of tagged rows keyed
  * by the join key (the same union-then-window trick the batch
  * operator uses, re-expressed as keyed state). Per key,
  * `flatMapGroupsWithState` buffers (a) left rows not yet finalizable
  * and (b) the right-row history still able to match a future left.
  * When the event-time watermark passes a left row's timestamp, no
  * earlier-timestamped right row can arrive anymore (the watermark
  * contract), so the row finalizes against the greatest right ts ≤ its
  * ts (inclusive — the DuckDB/kdb convention) and emits.
  *
  * State is bounded by the watermark horizon, not the stream length:
  * left state holds only rows above the watermark; right state prunes
  * to the single latest marker at-or-below the watermark (any earlier
  * one is dominated for every possible future left) plus those still
  * above it. An event-time timeout on the earliest pending left
  * flushes rows whose keys go quiet — without it a key receiving no
  * further input would never emit its tail.
  *
  * The right-side uniqueness contract (one row per (key, ts)) is
  * enforced in-state by keeping the max right id per timestamp — the
  * same dedup the batch query applies before [[graft.operators.AsOf]].
  */
object StreamingAsOf {

  /** One merged input row: a left (event) when isRight = false, a
    * right (marker) otherwise; `rid` is the row's own id either way.
    * `ts` duplicates tsMs as a Timestamp — the watermark column must
    * survive into the stateful operator's input (Spark rejects
    * event-time timeouts otherwise), so it rides along.
    */
  final case class In(key: Long, tsMs: Long, isRight: Boolean, rid: Long,
                      ts: java.sql.Timestamp)

  /** (tsMs, id) buffers; rights kept ts-ascending and ts-unique. */
  final case class AsOfState(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long)])

  final case class Out(key: Long, tsMs: Long, leftId: Long,
                       rightId: Option[Long], rightTsMs: Option[Long])

  /** Pure state transition: merge new rows, finalize every left at or
    * below `wm`, prune both buffers. Emission order within a batch is
    * (ts, id) — deterministic.
    */
  private[streaming] def sweep(key: Long, newRows: Seq[In],
                               st: Option[AsOfState], wm: Long): (Seq[Out], AsOfState) = {
    val lefts = st.map(_.lefts).getOrElse(Nil) ++
      newRows.collect { case r if !r.isRight => (r.tsMs, r.rid) }
    // uniqueness contract: max id per (key, ts)
    val rights = (st.map(_.rights).getOrElse(Nil) ++
      newRows.collect { case r if r.isRight => (r.tsMs, r.rid) })
      .groupBy(_._1).map { case (ts, xs) => (ts, xs.map(_._2).max) }
      .toSeq.sortBy(_._1)
    val (ready, pending) = lefts.partition(_._1 <= wm)
    val out = ready.sortBy(identity).map { case (ts, lid) =>
      val hit = rights.takeWhile(_._1 <= ts).lastOption
      Out(key, ts, lid, hit.map(_._2), hit.map(_._1))
    }
    // keep the latest right ≤ wm (sole possible below-watermark match
    // for any future left) and everything above the watermark
    val keepTs = rights.filter(_._1 <= wm).lastOption.map(_._1).getOrElse(Long.MinValue)
    val prunedRights = rights.filter(r => r._1 > wm || r._1 == keepTs)
    (out, AsOfState(pending, prunedRights))
  }

  /** Streaming state function (EventTimeTimeout). */
  def update(key: Long, rows: Iterator[In],
             state: GroupState[AsOfState]): Iterator[Out] = {
    val wm = state.getCurrentWatermarkMs()
    val newRows = if (state.hasTimedOut) Nil else rows.toSeq
    val (out, ns) = sweep(key, newRows, state.getOption, wm)
    if (ns.lefts.isEmpty && ns.rights.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(ns)
      // flush when the watermark passes the earliest pending left even
      // if this key never sees another row; pending ts > wm by
      // construction, satisfying the must-be-beyond-watermark rule
      if (ns.lefts.nonEmpty) {
        try state.setTimeoutTimestamp(ns.lefts.map(_._1).min)
        catch {
          case _: UnsupportedOperationException =>
          case _: IllegalStateException =>
        }
      }
    }
    out.iterator
  }

  /** Streaming entry: `ds` must carry a watermark (attach
    * `withWatermark` on the event-time column before selecting into
    * [[In]]).
    */
  def joinStream(spark: SparkSession, ds: Dataset[In]): Dataset[Out] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update)
  }

  /** Bounded/testing entry: the same sweep with the watermark at +∞ —
    * every left finalizes, which is exactly the batch
    * [[graft.operators.AsOf.joinBackward]] semantics.
    */
  def boundedOf(spark: SparkSession, ds: Dataset[In]): Dataset[Out] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[In], st: GroupState[AsOfState]) => {
          val (out, _) = sweep(k, it.toSeq, None, Long.MaxValue)
          if (st.exists) st.remove()
          out.iterator
        })
  }
}
