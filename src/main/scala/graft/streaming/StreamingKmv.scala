package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV / Theta distinct sketch — the stream twin of
  * `sketch_kmv` (the stream_hll convention): running approximate NDV
  * per group with k = 64 (hash, id) pairs of state per group, however
  * long the stream runs.
  *
  * State design: the kept set is the k smallest (h, id) pairs seen so
  * far, ordered exactly like the batch query's ROW_NUMBER window
  * ((h, id) ascending, dedup by pair) — so the bounded-mode run equals
  * the batch sketch BY CONSTRUCTION, not approximately. θ (the k-th
  * smallest h) only decreases and the kept count only grows, so the
  * final state is recoverable from the emission stream as
  * (max n_kept, min θ) — the monotone-fold trick stream_hll uses for
  * registers. Emission happens only when the kept set changes (no
  * re-emission on quiet batches).
  */
object StreamingKmv {

  val K = 64

  final case class KmvIn(grp: String, h: Double, id: Long)
  final case class KmvPair(h: Double, id: Long)
  final case class KmvState(kept: List[KmvPair])
  final case class KmvOut(grp: String, nKept: Int, theta: Option[Double])

  def update(key: String, rows: Iterator[KmvIn],
             state: GroupState[KmvState]): Iterator[KmvOut] = {
    val prev = state.getOption.map(_.kept).getOrElse(Nil)
    val merged = (prev ++ rows.map(r => KmvPair(r.h, r.id)))
      .distinct.sortBy(p => (p.h, p.id)).take(K)
    if (merged != prev) {
      state.update(KmvState(merged))
      Iterator.single(KmvOut(key, merged.size,
        if (merged.size == K) Some(merged.last.h) else None))
    } else Iterator.empty
  }

  /** Streaming entry: works on a streaming OR bounded input of
    * (group, normalized md5 hash, member id) rows.
    */
  def sketch(spark: SparkSession, in: Dataset[KmvIn]): Dataset[KmvOut] = {
    import spark.implicits._
    in.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update)
  }
}
