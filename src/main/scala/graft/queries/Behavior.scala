package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral event-stream operators over the `events` table: batch
  * sessionization (the gaps-and-islands twin of the streaming
  * [[TimeSeriesQueries]] `stream_sessions` state machine) and the
  * strictly-ordered sliding-window funnel popularized by ClickHouse's
  * `windowFunnel` — both staples of a product-analytics plane the
  * reference's KG/ETL scope stops short of (beyond-reference, same
  * oracle discipline as the rest of the suite).
  *
  * Determinism: every emitted column is integral (millisecond epochs,
  * counts, levels) — no IEEE chain to mirror; event order is pinned by
  * `(ts_ms, event_id)` on both engines.
  *
  * Scale: sessionization is two window passes over ONE per-user
  * shuffle+sort (lag and running-sum share the partitioning), then two
  * keyed aggregations — no global sort, no unpartitioned window. The
  * funnel distributes over users; the per-user triple-exists scan is
  * bounded by per-user activity (the ts_theilsen shape: degenerate only
  * for one-giant-user inputs, documented).
  */
object Behavior {

  private val GapMs = 1800000L // 30-minute inactivity gap
  private val FunnelMs = 14400000L // 4-hour funnel window (all levels occur at sf0.01)

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))

  /** Per-user session roll-up under a 30-minute inactivity gap:
    * session = maximal run of events with consecutive spacing
    * ≤ 30 min (strict `>` starts a new one). Emits per user the
    * session count, total events, summed session duration (last−first
    * per session, ms) and the largest session's event count — the
    * batch answer `stream_sessions` approximates incrementally.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    events(s, dir)
      .withColumn("prev", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts_ms") - col("prev") > GapMs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("dur_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        sum(col("dur_ms")).as("total_dur_ms"),
        max(col("n_ev")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  val sessionizeSql: String =
    """WITH ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
      |lagd AS (SELECT user_id, ts_ms,
      |    lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev,
      |    event_id
      |  FROM ev),
      |flg AS (SELECT user_id, ts_ms, event_id,
      |    CASE WHEN prev IS NULL OR ts_ms - prev > 1800000 THEN 1 ELSE 0 END AS new_s
      |  FROM lagd),
      |sid AS (SELECT user_id, ts_ms,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flg),
      |ses AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev,
      |    MAX(ts_ms) - MIN(ts_ms) AS dur_ms
      |  FROM sid GROUP BY user_id, sid)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
      |  CAST(SUM(dur_ms) AS BIGINT) AS total_dur_ms,
      |  CAST(MAX(n_ev) AS BIGINT) AS max_session_events
      |FROM ses GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sliding-window ordered funnel (ClickHouse `windowFunnel('strict
    * order' off, dedup off) semantics, chain view→click→purchase,
    * 4-hour window): a user reaches level k if SOME view is followed
    * by a strictly-later click which is followed by a strictly-later
    * purchase, all within 4 h of that view. Differs from
    * `funnel_conversion` (first-touch timestamps, unbounded window):
    * this searches ALL anchor views, bounded by the window. Emits one
    * row per user with the max level (0–3).
    */
  def windowFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    def tsOf(t: String): Column =
      sort_array(collect_list(when(col("event_type") === t, col("ts_ms"))))
    ev.groupBy(col("user_id"))
      .agg(tsOf("view").as("vs"), tsOf("click").as("cs"), tsOf("purchase").as("ps"))
      .withColumn("l3", exists(col("vs"), v =>
        exists(col("cs"), c => c > v && c <= v + FunnelMs &&
          exists(col("ps"), p => p > c && p <= v + FunnelMs))))
      .withColumn("l2", exists(col("vs"), v =>
        exists(col("cs"), c => c > v && c <= v + FunnelMs)))
      .withColumn("l1", size(col("vs")) > 0)
      .select(col("user_id"),
        when(col("l3"), 3L).when(col("l2"), 2L).when(col("l1"), 1L)
          .otherwise(0L).as("level"))
      .orderBy(col("user_id"))
  }

  val windowFunnelSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |arrs AS (SELECT user_id,
      |    coalesce(list(ts_ms ORDER BY ts_ms) FILTER (WHERE event_type = 'view'), []) AS vs,
      |    coalesce(list(ts_ms ORDER BY ts_ms) FILTER (WHERE event_type = 'click'), []) AS cs,
      |    coalesce(list(ts_ms ORDER BY ts_ms) FILTER (WHERE event_type = 'purchase'), []) AS ps
      |  FROM ev GROUP BY user_id),
      |lv AS (SELECT user_id,
      |    len(list_filter(vs, v ->
      |      len(list_filter(cs, c -> c > v AND c <= v + 14400000 AND
      |        len(list_filter(ps, p -> p > c AND p <= v + 14400000)) > 0)) > 0)) > 0 AS l3,
      |    len(list_filter(vs, v ->
      |      len(list_filter(cs, c -> c > v AND c <= v + 14400000)) > 0)) > 0 AS l2,
      |    len(vs) > 0 AS l1
      |  FROM arrs)
      |SELECT user_id,
      |  CAST(CASE WHEN l3 THEN 3 WHEN l2 THEN 2 WHEN l1 THEN 1 ELSE 0 END AS BIGINT) AS level
      |FROM lv ORDER BY user_id""".stripMargin

  /** Bounded-mode run of [[graft.streaming.StreamingFunnel]] — the
    * stateful streaming twin, certified against the SAME oracle as
    * `window_funnel` (bounded mode processes each user's history in
    * one group pass and must reproduce the batch funnel exactly; the
    * multi-batch incremental path is pinned by StreamingFunnelSpec).
    */
  def streamFunnel(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingFunnel.levels(s, Tables(s, dir, "events"))
      .toDF()
      .orderBy(col("user_id"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sessionize" -> (sessionize _),
    "window_funnel" -> (windowFunnel _),
    "stream_funnel" -> (streamFunnel _))

  val oracles: Map[String, String] = Map(
    "sessionize" -> sessionizeSql,
    "window_funnel" -> windowFunnelSql,
    "stream_funnel" -> windowFunnelSql)
}
