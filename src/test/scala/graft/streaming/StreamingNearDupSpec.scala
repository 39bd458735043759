package graft.streaming

import graft.SparkSpec

/** Streaming near-dup candidates: minhash bands against per-band state.
  * Run both as a bounded Dataset (semantics) and through a real
  * streaming query with two batches (cross-batch detection + no
  * re-emission).
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the river bank"
  private val docB = "the quick brown fox jumps over the lazy dog near the river bend"
  private val docC = "completely unrelated content discussing spark catalyst optimizer internals"

  test("bounded: near-identical docs collide on at least one band; pairs normalized") {
    val docs = Seq(("a", docA), ("b", docB), ("c", docC)).toDF("id", "text")
    val cands = StreamingNearDup.candidates(spark, docs, "id", "text")
      .collect().map(c => (c.idA, c.idB)).distinct
    assert(cands.contains(("a", "b")), s"expected (a,b) candidate, got ${cands.toSeq}")
    assert(cands.forall { case (x, y) => x < y }) // normalized order
    assert(!cands.contains(("a", "c")) && !cands.contains(("b", "c")))
  }

  test("batch kernel parity: streaming bands equal minhashLshPairs candidate logic") {
    // the same two docs must be LSH candidates in the batch pipeline too
    val pairs = graft.operators.Dedup.minhashLshPairs(
      Seq(("a", docA), ("b", docB)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(pairs.length == 1 && pairs.head.getString(0) == "a")
  }

  test("short docs (<3 tokens, no shingles) never become candidates") {
    // unguarded, every empty shingle set minhashes to all-null and
    // concat_ws collapses to the same md5("") band keys — these three
    // unrelated shorts would all pair with each other
    val docs = Seq(("s1", "hi"), ("s2", "ok"), ("s3", "yes now"),
      ("a", docA), ("b", docB)).toDF("id", "text")
    val cands = StreamingNearDup.candidates(spark, docs, "id", "text")
      .collect().map(c => (c.idA, c.idB)).distinct
    assert(cands.toSeq == Seq(("a", "b")), s"got ${cands.toSeq}")
  }

  test("overflow arrival duplicated in one batch emits its pairs once") {
    // cap 1: 'a' fills the band state; 'b' overflows (pairs but is not
    // retained); the second copy of 'b' in the same batch must not
    // re-emit the same pairs
    val docs = Seq(("a", docA), ("b", docB), ("b", docB)).toDF("id", "text")
    val cands = StreamingNearDup.candidates(spark, docs, "id", "text", maxPerBand = 1)
      .collect().map(c => (c.idA, c.idB, c.band))
    assert(cands.length == cands.distinct.length,
      s"duplicate in-batch overflow re-emitted: ${cands.toSeq}")
    assert(cands.map(c => (c._1, c._2)).distinct.toSeq == Seq(("a", "b")))
  }

  test("streaming: cross-batch candidate emitted once, state caps retention") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val src = mem.toDF().toDF("id", "text")
    val q = StreamingNearDup.candidates(spark, src, "id", "text")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    mem.addData(("a", docA), ("c", docC))
    q.processAllAvailable()
    val afterB1 = spark.table("neardup_out").count()
    assert(afterB1 == 0, "no near-dups within batch 1")
    mem.addData(("b", docB)) // arrives a batch later: pairs against state
    q.processAllAvailable()
    // one candidate row per colliding band (downstream dedups pairs,
    // same as the batch pipeline's distinct-before-verify)
    val raw = spark.table("neardup_out")
      .select("idA", "idB").as[(String, String)].collect()
    assert(raw.distinct.toSeq == Seq(("a", "b")))
    mem.addData(("b", docB)) // replay: already retained, nothing new
    q.processAllAvailable()
    val replay = spark.table("neardup_out")
      .select("idA", "idB").as[(String, String)].collect()
    assert(replay.length == raw.length, "replayed doc must not re-emit pairs")
    q.stop()
  }
}
