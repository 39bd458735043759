package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming exact dedup: bounded mode equals the batch distinct
  * count, and a multi-batch stream emits each key exactly once on its
  * first-arrival batch — so emissions fold to the batch distinct for
  * ANY batch split of the input.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("bounded mode equals batch COUNT(DISTINCT) per type") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.streamDedup(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables(spark, dir, "events")
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("multi-batch stream: each key emitted once, on its first-arrival batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val in = mem.toDF().toDF("grp", "id").as[StreamingDedup.KeyIn]
    val q = StreamingDedup.firstSeen(spark, in)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    val b1 = Seq("a" -> 1L, "a" -> 2L, "b" -> 1L, "a" -> 1L)
    val b2 = Seq("a" -> 1L, "a" -> 3L, "b" -> 1L, "c" -> 9L)
    mem.addData(b1: _*)
    q.processAllAvailable()
    val after1 = spark.table("dedup_out").as[StreamingDedup.KeyOut]
      .collect().map(k => (k.grp, k.id)).toSet
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val all = spark.table("dedup_out").as[StreamingDedup.KeyOut]
      .collect().map(k => (k.grp, k.id))
    // exactly-once per key
    assert(all.length == all.distinct.length, "a key was re-emitted")
    // batch 1 emits exactly its distinct keys
    assert(after1 == b1.toSet)
    // total = distinct of the union; batch-2 additions are only the new keys
    assert(all.toSet == (b1 ++ b2).toSet)
  }
}
