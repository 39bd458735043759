package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EXACT first-seen dedup: each (group, id) key is emitted
  * exactly once, on the batch where it first appears — the streaming
  * twin of `dedup_exact`, the same way stream_hll/stream_kmv twin the
  * batch sketches.
  *
  * State design: keyed by (group, id); the state is a single marker
  * bit, so memory is one boolean per distinct key — the irreducible
  * cost of EXACT streaming dedup (any smaller state admits false
  * emissions; the bounded-state alternative is the near-dup /
  * sketch family, or `dropDuplicatesWithinWatermark` when keys stop
  * recurring after a horizon — both already in the suite). Emission
  * is append-only and once-per-key, so ANY batch split of the input
  * folds to the batch distinct: the stream operator is held to the
  * batch oracle by construction.
  */
object StreamingDedup {

  final case class KeyIn(grp: String, id: Long)
  final case class Seen(seen: Boolean)
  final case class KeyOut(grp: String, id: Long)

  def update(key: (String, Long), rows: Iterator[KeyIn],
             state: GroupState[Seen]): Iterator[KeyOut] = {
    if (state.exists) Iterator.empty
    else {
      state.update(Seen(true))
      Iterator.single(KeyOut(key._1, key._2))
    }
  }

  /** Streaming entry: works on a streaming OR bounded keyed input. */
  def firstSeen(spark: SparkSession, in: Dataset[KeyIn]): Dataset[KeyOut] = {
    import spark.implicits._
    in.groupByKey(r => (r.grp, r.id))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update)
  }
}
