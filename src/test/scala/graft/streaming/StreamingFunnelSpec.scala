package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamingFunnel: bounded mode equals the batch window_funnel
  * exactly; a multi-batch stream carries funnel state across batches
  * (chain split over batches still completes, level stays monotone);
  * horizon pruning keeps state bounded without forgetting achieved
  * levels.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val H = StreamingFunnel.WindowMs

  test("bounded mode equals the batch window_funnel exactly") {
    val batch = graft.queries.Behavior.windowFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stream = graft.queries.Behavior.streamFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stream == batch)
    assert(stream.values.exists(_ >= 2L)) // non-trivial fixture
  }

  test("multi-batch stream completes a chain split across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long)]
    val in = mem.toDF().toDF("user_id", "event_type", "ts_ms", "event_id")
      .select(col("user_id"), col("event_type"),
        timestamp_millis(col("ts_ms")).as("ts"), col("event_id"))
    val q = StreamingFunnel.levels(spark, in)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 views; user 2 views+clicks
    mem.addData((1L, "view", 1000L, 1L), (2L, "view", 1000L, 2L),
      (2L, "click", 2000L, 3L))
    q.processAllAvailable()
    // batch 2: user 1 clicks (chain across batches); user 2 purchases
    // OUTSIDE its view's 4h window (no level 3)
    mem.addData((1L, "click", 5000L, 4L), (2L, "purchase", 1000L + H + 1L, 5L))
    q.processAllAvailable()
    // batch 3: user 1 purchases inside the window -> level 3
    mem.addData((1L, "purchase", 9000L, 6L))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("funnel_out").as[StreamingFunnel.UserLevel].collect()
      .groupBy(_.user_id).map { case (u, es) => u -> es.map(_.level).max }
    assert(last == Map(1L -> 3L, 2L -> 2L))
    // monotone: per-user emitted levels never decrease batch-over-batch
    val perUser = spark.table("funnel_out").as[StreamingFunnel.UserLevel]
      .collect().zipWithIndex.groupBy(_._1.user_id)
    perUser.values.foreach { es =>
      val ordered = es.sortBy(_._2).map(_._1.level)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => b >= a })
    }
  }

  test("horizon pruning bounds state but achieved levels persist") {
    val st = new org.apache.spark.sql.streaming.GroupState[StreamingFunnel.FunnelState] {
      private var s: Option[StreamingFunnel.FunnelState] = None
      override def exists: Boolean = s.isDefined
      override def get: StreamingFunnel.FunnelState = s.get
      override def getOption: Option[StreamingFunnel.FunnelState] = s
      override def update(v: StreamingFunnel.FunnelState): Unit = s = Some(v)
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
    }
    def ev(t: String, ts: Long, id: Long) = StreamingFunnel.Ev(7L, t, ts, id)
    // full chain early
    StreamingFunnel.update(7L,
      Iterator(ev("view", 0L, 1L), ev("click", 10L, 2L), ev("purchase", 20L, 3L)), st)
    assert(st.get.level == 3)
    // far-future event prunes the horizon...
    StreamingFunnel.update(7L, Iterator(ev("view", 10L * H, 4L)), st)
    assert(st.get.vs.forall(_ >= 9L * H) && st.get.cs.isEmpty && st.get.ps.isEmpty)
    // ...but the achieved level persists
    val out = StreamingFunnel.update(7L, Iterator(ev("view", 10L * H + 1L, 5L)), st)
    assert(out.next().level == 3L)
  }
}
