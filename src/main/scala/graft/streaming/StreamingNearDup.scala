package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming NEAR-dup candidate detection — the stateful companion to
  * [[graft.operators.Dedup.streamingDedup]] (which is exact-only):
  * arriving documents are minhash-banded with the SAME kernel as the
  * batch pipeline, and each band key carries a bounded state of
  * previously-seen doc ids. A new doc sharing any band with a retained
  * doc emits a candidate pair immediately — continuous ingestion gets
  * near-dup flags without rescanning the corpus.
  *
  * Scale/state design: state is keyed by band key, so it shards across
  * executors with the stream; each band retains at most `maxPerBand`
  * ids (the EARLIEST arrivals — the canonical survivors of a dedup
  * policy), so total state is bounded by #active-bands × maxPerBand
  * ids regardless of stream length. Overflow arrivals still pair
  * against the retained set (they can be flagged as dupes of
  * canonicals) but don't extend it. Candidates are LSH-recall only —
  * verify exact jaccard downstream, exactly like the batch
  * [[Dedup.minhashLshPairs]] contract.
  */
object StreamingNearDup {

  final case class BandDoc(band: String, id: String)
  final case class BandState(ids: Seq[String])
  final case class Candidate(idA: String, idB: String, band: String)

  /** Per-band state transition: pair each new arrival with the retained
    * set (and with prior arrivals in the same batch), then extend the
    * retained set up to the cap.
    */
  def update(maxPerBand: Int)(
      band: String, docs: Iterator[BandDoc], state: GroupState[BandState])
      : Iterator[Candidate] = {
    var retained = state.getOption.map(_.ids).getOrElse(Seq.empty)
    val seenSet = scala.collection.mutable.Set(retained: _*)
    val out = scala.collection.mutable.ArrayBuffer[Candidate]()
    docs.foreach { d =>
      if (!seenSet.contains(d.id)) {
        retained.foreach { s =>
          val (a, b) = if (s < d.id) (s, d.id) else (d.id, s)
          out += Candidate(a, b, band)
        }
        // seenSet gains the id even when the retained set is full:
        // a second copy of an overflow doc in the SAME batch must not
        // re-emit its pairs. Cross-batch redelivery of an overflow doc
        // is still at-least-once (persisting every seen id would make
        // state unbounded, defeating the cap) — documented contract:
        // downstream takes DISTINCT pairs, as the bounded-mode oracle
        // query does.
        seenSet += d.id
        if (retained.size < maxPerBand) {
          retained :+= d.id
        }
      }
    }
    state.update(BandState(retained))
    out.iterator
  }

  /** Band the raw (id, text) stream with the batch minhash kernel.
    *
    * The batch pipeline isolates the shingle-hash array and the
    * signature behind `.cache()` plan barriers; a streaming plan can't
    * cache, so the same evaluate-once guarantee comes from
    * [[TextFunctions.bindOnce]] expression bindings — without them,
    * bandKeys' 2×bands signature references each re-run the whole
    * per-shingle md5 kernel (measured 47s → 1.5s at sf0.1).
    */
  def banded(docs: DataFrame, idCol: String, textCol: String,
             nHashes: Int, bands: Int): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    val keys = TextFunctions.bindOnce(
        Dedup.shingleHashes(array_distinct(TextFunctions.shingles(col(textCol))))) { hs =>
      // Empty-shingle guard, mirroring the batch path's size(sh) > 0
      // filter: a doc with <3 tokens has no shingles, minhash of an
      // empty set is all-null, and concat_ws skips nulls — every short
      // doc would land on the same md5("") band keys and pair with
      // every other short doc. The empty array here means posexplode
      // emits no rows for the doc (same effect as the batch filter).
      when(size(hs) > 0,
        TextFunctions.bindOnce(Dedup.minhashSigAffine(hs, nHashes)) { sig =>
          Dedup.bandKeys(sig, bands, nHashes / bands)
        }).otherwise(array().cast("array<string>"))
    }
    docs.select(col(idCol).cast("string").as("id"),
        posexplode(keys).as(Seq("band_id", "key")))
      .select(concat_ws("|", col("band_id"), col("key")).as("band"), col("id"))
      .as[BandDoc]
  }

  /** Streaming entry: works on a streaming OR bounded input (the spec
    * runs both; output semantics match).
    */
  def candidates(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
                 nHashes: Int = 8, bands: Int = 4,
                 maxPerBand: Int = 64): Dataset[Candidate] = {
    import spark.implicits._
    banded(docs, idCol, textCol, nHashes, bands)
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update(maxPerBand))
  }
}
