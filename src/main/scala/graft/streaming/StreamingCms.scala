package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Count-Min sketch: the deterministic CMS of
  * [[graft.functions.Sketches]] maintained as stream state — running
  * frequency estimates over continuous ingestion without retaining any
  * item, the heavy-hitter companion to [[StreamingHll]].
  *
  * State design: keyed by (row, bucket) of the counter matrix; the
  * state is ONE long (the running count), so total state is bounded by
  * d×w counters (4×1024 here) however long the stream runs and however
  * many distinct items pass — the defining CMS property carries to the
  * stream plane unchanged. Counts are additive and weights positive,
  * so the emitted running totals are strictly monotone per counter and
  * a max-fold of emissions recovers the batch counter matrix EXACTLY —
  * bounded mode is certified against the batch sketch_cms oracle.
  */
object StreamingCms {

  final case class CntIn(row: Int, bucket: Long, w: Long)
  final case class CntState(c: Long)
  final case class CntOut(row: Int, bucket: Long, c: Long)

  /** Per-counter transition: add the batch's weight sum, emit the new
    * running total when it grew.
    */
  def update(key: (Int, Long), rows: Iterator[CntIn],
             state: GroupState[CntState]): Iterator[CntOut] = {
    val prev = state.getOption.map(_.c).getOrElse(0L)
    val add = rows.foldLeft(0L)((m, r) => m + r.w)
    if (add > 0L) {
      val next = prev + add
      state.update(CntState(next))
      Iterator.single(CntOut(key._1, key._2, next))
    } else Iterator.empty
  }

  /** Streaming entry: works on a streaming OR bounded increment input.
    * Input rows are (row, bucket, weight) from
    * [[graft.functions.Sketches.cmsBucket]].
    */
  def counters(spark: SparkSession, in: Dataset[CntIn]): Dataset[CntOut] = {
    import spark.implicits._
    in.groupByKey(r => (r.row, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update)
  }
}
