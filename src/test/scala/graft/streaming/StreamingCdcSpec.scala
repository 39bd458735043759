package graft.streaming

import graft.SparkSpec

/** Streaming CDC: bounded mode equals the batch snapshot, out-of-order
  * multi-batch delivery converges to the same state, and tombstones
  * keep winning over late stale upserts.
  */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  test("bounded mode equals batch cdc_apply row-for-row") {
    val got = graft.queries.TimeSeriesQueries
      .streamCdc(spark, "/root/testdata/sf0.001").collect().toSeq
    val expected = graft.queries.TimeSeriesQueries
      .cdcApply(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("multi-batch out-of-order: late stale upsert cannot beat a newer record or a tombstone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[StreamingCdc.In]
    val q = StreamingCdc.snapshot(spark, mem.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Append()).start()
    // key 1: upsert then tombstone; key 2: newer upsert first
    mem.addData(
      StreamingCdc.In(1L, 100L, 1L, "U", 1.0),
      StreamingCdc.In(1L, 200L, 2L, "D", 0.0),
      StreamingCdc.In(2L, 300L, 3L, "U", 3.0))
    q.processAllAvailable()
    // LATE arrivals: stale upserts older than the current winners
    mem.addData(
      StreamingCdc.In(1L, 150L, 9L, "U", 9.0),  // older than the tombstone
      StreamingCdc.In(2L, 250L, 8L, "U", 8.0))  // older than ts=300
    q.processAllAvailable()
    // genuinely newer upsert revives key 1
    mem.addData(StreamingCdc.In(1L, 400L, 4L, "U", 4.0))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("cdc_out").as[StreamingCdc.Out].collect()
    // batch 2 emitted NOTHING (stale records lost against state)
    val winners = emitted.groupBy(_.key).map { case (k, es) =>
      k -> es.maxBy(e => (e.tsMs, e.id))
    }
    assert(winners(1L) == StreamingCdc.Out(1L, 400L, 4L, "U", 4.0))
    assert(winners(2L) == StreamingCdc.Out(2L, 300L, 3L, "U", 3.0))
    assert(emitted.count(_.key == 2L) == 1, "stale upsert for key 2 must not emit")
    // the per-batch fold emits ONE winner per key per batch: batch 1
    // collapses upsert+tombstone to the tombstone, batch 3 revives
    assert(emitted.count(_.key == 1L) == 2, "key 1 emits: batch-1 tombstone, batch-3 revival")
  }
}
