package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.queries.Behavior.windowFunnel]]: per-user
  * max funnel level (view→click→purchase, all anchors, 4-hour window)
  * maintained incrementally with flatMapGroupsWithState — the
  * real-time conversion scoreboard.
  *
  * State design: the achieved level is MONOTONE, so completed chains
  * never need revisiting — the state keeps only (level, events within
  * the trailing 4 h of the user's max event time). Any chain whose
  * anchor view has fallen off the horizon was already reflected in
  * `level` when its last event arrived; any future chain's anchor must
  * still be inside the horizon. State per user is therefore bounded by
  * 4 h of that user's activity regardless of stream length.
  *
  * Exactness contract (the stream_asof convention): events arriving in
  * event-time order across batches — or all in one bounded batch —
  * reproduce the batch `window_funnel` EXACTLY (the bounded-mode
  * driver row shares its oracle). Out-of-order arrivals within a batch
  * are sorted by (ts, event_id) before applying; cross-batch
  * stragglers older than the 4 h horizon follow the documented
  * at-least semantics (they can only under-count, never inflate).
  */
object StreamingFunnel {

  final case class Ev(user_id: Long, event_type: String, ts_ms: Long, event_id: Long)
  final case class FunnelState(level: Int, vs: Seq[Long], cs: Seq[Long],
                               ps: Seq[Long], maxTs: Long)
  final case class UserLevel(user_id: Long, level: Long)

  val WindowMs = 14400000L

  def update(user: Long, evs: Iterator[Ev], state: GroupState[FunnelState])
      : Iterator[UserLevel] = {
    val st = state.getOption.getOrElse(
      FunnelState(0, Nil, Nil, Nil, Long.MinValue))
    var vs = st.vs; var cs = st.cs; var ps = st.ps; var maxTs = st.maxTs
    evs.toSeq.sortBy(e => (e.ts_ms, e.event_id)).foreach { e =>
      e.event_type match {
        case "view" => vs :+= e.ts_ms
        case "click" => cs :+= e.ts_ms
        case "purchase" => ps :+= e.ts_ms
        case _ =>
      }
      if (e.ts_ms > maxTs) maxTs = e.ts_ms
    }
    val l3 = vs.exists(v => cs.exists(c => c > v && c <= v + WindowMs &&
      ps.exists(p => p > c && p <= v + WindowMs)))
    val l2 = l3 || vs.exists(v => cs.exists(c => c > v && c <= v + WindowMs))
    val l1 = vs.nonEmpty
    val computed = if (l3) 3 else if (l2) 2 else if (l1) 1 else 0
    val newLevel = math.max(st.level, computed)
    val cut = maxTs - WindowMs
    state.update(FunnelState(newLevel,
      vs.filter(_ >= cut), cs.filter(_ >= cut), ps.filter(_ >= cut), maxTs))
    Iterator.single(UserLevel(user, newLevel.toLong))
  }

  /** Streaming entry: works on a streaming OR bounded input (the spec
    * runs both; bounded mode equals the batch funnel exactly).
    */
  def levels(spark: SparkSession, events: DataFrame): Dataset[UserLevel] = {
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_type"), unix_millis(col("ts")).as("ts_ms"),
        col("event_id").cast("long").as("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update)
  }
}
