package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count sketch: the deterministic HLL of
  * [[graft.functions.Sketches]] maintained as stream state — running
  * approximate NDV per group over continuous ingestion, without
  * retaining any distinct value.
  *
  * State design: keyed by (group, register); the state is ONE int (the
  * running max rank), so total state is bounded by groups × m
  * registers — the same 256-registers-per-group footprint a batch HLL
  * holds, however long the stream runs. Emission is the running max
  * whenever it grows (monotone), so downstream folds of the LAST (=
  * max) emission per register equal the batch registers exactly: the
  * stream estimate is certified against the batch oracle, the
  * stream_sessions/stream_neardup convention.
  */
object StreamingHll {

  final case class RegIn(grp: String, bucket: Int, rho: Int)
  final case class MaxState(r: Int)
  final case class RegOut(grp: String, bucket: Int, r: Int)

  /** Per-register transition: keep the running max rank, emit when it
    * grows (first batch always emits).
    */
  def update(key: (String, Int), rows: Iterator[RegIn],
             state: GroupState[MaxState]): Iterator[RegOut] = {
    val prev = state.getOption.map(_.r).getOrElse(0)
    val batchMax = rows.foldLeft(0)((m, r) => math.max(m, r.rho))
    val next = math.max(prev, batchMax)
    if (next > prev) {
      state.update(MaxState(next))
      Iterator.single(RegOut(key._1, key._2, next))
    } else Iterator.empty
  }

  /** Streaming entry: works on a streaming OR bounded register input.
    * Input rows are (group, bucket, rho) from
    * [[graft.functions.Sketches.hllParts]].
    */
  def registers(spark: SparkSession, regs: Dataset[RegIn]): Dataset[RegOut] = {
    import spark.implicits._
    regs.groupByKey(r => (r.grp, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update)
  }
}
