package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per window — Metwally et al.'s SpaceSaving
  * summary (SIGMOD 2005) as `flatMapGroupsWithState` state: at most
  * [[Capacity]] counters per window key regardless of the item-domain
  * size, the bounded-state property that makes top-k survivable on an
  * unbounded stream. When the per-window distinct-item count fits the
  * capacity the summary IS the exact count multiset (no eviction ever
  * fires, so the result is arrival-order independent) — the regime the
  * DuckDB oracle certifies, the stream_cms/stream_hll bounded-mode
  * convention. The eviction path (err > 0, order-dependent by design)
  * is pinned by a hand-ordered spec instead.
  */
object StreamingTopK {

  final case class In(win: Long, item: String)
  final case class Counter(item: String, cnt: Long, err: Long)
  final case class Summary(counters: List[Counter])
  final case class Out(win: Long, item: String, cnt: Long, err: Long)

  val Capacity = 8

  def update(win: Long, rows: Iterator[In],
             state: GroupState[Summary]): Iterator[Out] = {
    var cs = state.getOption.map(_.counters).getOrElse(Nil)
    rows.foreach { r =>
      if (cs.exists(_.item == r.item))
        cs = cs.map(c => if (c.item == r.item) c.copy(cnt = c.cnt + 1) else c)
      else if (cs.length < Capacity)
        cs = Counter(r.item, 1L, 0L) :: cs
      else {
        // evict the smallest counter (item tiebreak for determinism
        // GIVEN an arrival order); the newcomer inherits its count
        val min = cs.minBy(c => (c.cnt, c.item))
        cs = Counter(r.item, min.cnt + 1L, min.cnt) :: cs.filterNot(_ eq min)
      }
    }
    state.update(Summary(cs))
    cs.iterator.map(c => Out(win, c.item, c.cnt, c.err))
  }

  /** Streaming entry: works on a streaming OR bounded keyed input. */
  def summaries(spark: SparkSession, in: Dataset[In]): Dataset[Out] = {
    import spark.implicits._
    in.groupByKey(_.win)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update)
  }
}
