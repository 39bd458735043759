package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** The stream_tumbling registry query runs windowedCounts in BATCH
  * mode (oracle-certified); this spec drives the SAME transform as a
  * real multi-batch Structured Streaming query — watermarked
  * event-time tumbling windows, Complete output — and asserts the
  * final emitted counts equal the batch plane on identical rows,
  * including a late-but-within-watermark arrival landing in its
  * original window.
  */
class StreamTumblingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts: multi-batch stream with late data equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val h = 3600000L
    // (ts_ms, type): batch 1 fills hours 0 and 1; batch 2 adds hour 2
    // AND a late row for hour 0 that is still inside the 1h watermark
    // horizon when it arrives (max seen 2h10m -> watermark 1h10m...
    // late row at 0h59m is DROPPED by design; the within-horizon late
    // row at 1h30m must land in window 1)
    val b1 = Seq((5L * 60000, "click"), (20L * 60000, "view"),
      (h + 10L * 60000, "click"))
    val b2 = Seq((2 * h + 10L * 60000, "view"), (h + 30L * 60000, "click"))
    val all = b1 ++ b2

    val in = MemoryStream[(Long, String)]
    val streamed = in.toDF().toDF("ts_ms", "event_type")
      .select(timestamp_millis(col("ts_ms")).as("ts"), col("event_type"))
    val counts = StreamPipeline.windowedCounts(
      streamed, "ts", "event_type", "1 hour", "1 hour")

    val q = counts.writeStream.format("memory")
      .queryName("tumbling_out").outputMode(OutputMode.Complete())
      .trigger(Trigger.ProcessingTime(0)).start()
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tumbling_out")
      .select(unix_millis(col("win_start")).as("w"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted

    val want = all.groupBy { case (ts, t) => (ts / h * h, t) }
      .map { case ((w, t), rows) => (w, t, rows.size.toLong) }.toSeq.sorted
    assert(got.toSeq == want,
      s"stream ${got.mkString(",")} != batch ${want.mkString(",")}")
  }
}
