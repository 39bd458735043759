package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamingTopK: bounded mode equals exact batch counts when the item
  * domain fits the capacity; the eviction path obeys the SpaceSaving
  * invariants (cnt ≥ true ≥ cnt − err, Σcnt = stream length) on a
  * hand-ordered overflow sequence; a real multi-batch stream carries
  * state across batches.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("bounded mode equals exact batch counts (alphabet < capacity)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.streamTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expected = graft.Tables(spark, dir, "events")
      .select((unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).flatMap { case (day, rs) =>
        rs.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
          .sortBy { case (t, c) => (-c, t) }.take(3).zipWithIndex
          .map { case ((t, c), i) => (day, i + 1L) -> ((t, c, 0L)) }
      }.toMap
    assert(got == expected)
    assert(got.values.forall(_._3 == 0L)) // exact regime: zero error
  }

  test("SpaceSaving eviction keeps the error bound on an overflow alphabet") {
    // 12 distinct items > capacity 8, single group, one partition —
    // a deterministic arrival order so the summary is reproducible
    val items = (0 until 12).flatMap(i => Seq.fill(12 - i)(s"w$i"))
    val in = items.map(w => StreamingTopK.In(0L, w))
    val state = scala.collection.mutable.Map[String, (Long, Long)]()
    var cs = List.empty[StreamingTopK.Counter]
    val out = StreamingTopK.update(0L, in.iterator,
      new org.apache.spark.sql.streaming.GroupState[StreamingTopK.Summary] {
        private var s: Option[StreamingTopK.Summary] = None
        override def exists: Boolean = s.isDefined
        override def get: StreamingTopK.Summary = s.get
        override def getOption: Option[StreamingTopK.Summary] = s
        override def update(v: StreamingTopK.Summary): Unit = s = Some(v)
        override def remove(): Unit = s = None
        override def hasTimedOut: Boolean = false
        override def setTimeoutDuration(d: Long): Unit = ()
        override def setTimeoutDuration(d: String): Unit = ()
        override def setTimeoutTimestamp(t: Long): Unit = ()
        override def setTimeoutTimestamp(t: Long, a: String): Unit = ()
        override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
        override def setTimeoutTimestamp(t: java.sql.Date, a: String): Unit = ()
        override def getCurrentWatermarkMs(): Long = 0L
        override def getCurrentProcessingTimeMs(): Long = 0L
      }).toList
    assert(out.length == StreamingTopK.Capacity)
    val trueCounts = items.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // Σ counters = stream length (SpaceSaving invariant)
    assert(out.map(_.cnt).sum == items.length)
    out.foreach { c =>
      val t = trueCounts.getOrElse(c.item, 0L)
      assert(c.cnt >= t, s"${c.item}: cnt ${c.cnt} < true $t")
      assert(c.cnt - c.err <= t, s"${c.item}: cnt-err overclaims")
    }
    // the guaranteed-heavy items (count > n/capacity) all survive
    val guaranteed = trueCounts.filter(_._2 > items.length / StreamingTopK.Capacity).keySet
    assert(guaranteed.subsetOf(out.map(_.item).toSet))
  }

  test("multi-batch stream carries counts across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val in = mem.toDF().toDF("win", "item").as[StreamingTopK.In]
    val q = StreamingTopK.summaries(spark, in)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, "a"), (1L, "a"), (1L, "b"))
    q.processAllAvailable()
    mem.addData((1L, "a"), (1L, "c"), (1L, "b"), (1L, "b"))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("topk_out").as[StreamingTopK.Out].collect()
      .groupBy(_.item).map { case (k, es) => k -> es.map(_.cnt).max }
    assert(last == Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
  }
}
