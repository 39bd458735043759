package graft.streaming

import graft.SparkSpec
import Sessionize._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("inactivity-gap sessionization splits and counts correctly") {
    val events = Seq(
      Event(1L, 0), Event(1L, 1000), Event(1L, 2000), // session A (3)
      Event(1L, 60000), Event(1L, 61000), // session B (2)
      Event(2L, 5000)) // session C (1)
      .toDS()
    val sessions = Sessionize.sessionsOf(spark, events, gapMs = 10000)
      .collect().sortBy(s => (s.userId, s.startMs))
    assert(sessions.toSeq == Seq(
      Session(1L, 0, 2000, 3),
      Session(1L, 60000, 61000, 2),
      Session(2L, 5000, 5000, 1)))
  }

  test("timeout closes the idle user's open session and clears state") {
    import org.apache.spark.sql.streaming.TestGroupState
    import Sessionize.SessionState
    // a timed-out invocation (empty batch for the key) must EMIT the
    // open session and remove state — not silently keep it forever
    val timedOut = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(SessionState(100L, 900L, 3)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 10000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    val out = Sessionize.updateSessions(1000L)(7L, Iterator.empty, timedOut).toSeq
    assert(out == Seq(Sessionize.Session(7L, 100L, 900L, 3)))
    assert(timedOut.isRemoved)
    // a live invocation registers a timeout for the open session
    val live = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.empty[SessionState](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 10000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out2 = Sessionize.updateSessions(1000L)(7L, Iterator(Event(7L, 50L)), live).toSeq
    assert(out2.isEmpty && live.exists)
    // the timeout must actually register (the function swallows
    // UnsupportedOperationException for the batch path — a regression
    // that stopped registering would otherwise be invisible)
    assert(live.getTimeoutTimestampMs.isPresent)
  }

  test("sessionizes the real events table: every event in exactly one session") {
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id as userId", "unix_millis(ts) as tsMs")
      .as[Event]
    val sessions = Sessionize.sessionsOf(spark, events, gapMs = 3600L * 1000)
    assert(sessions.agg(org.apache.spark.sql.functions.sum("nEvents"))
      .collect().head.getLong(0) == events.count())
    // session invariant: end >= start, all within the data's time range
    assert(sessions.filter(s => s.endMs < s.startMs).count() == 0)
  }
}
