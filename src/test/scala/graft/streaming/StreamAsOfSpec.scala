package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming as-of join certified two ways: bounded mode must
  * equal the batch window operator row-for-row on the real corpus
  * (that equivalence is ALSO the DuckDB oracle gate — stream_asof
  * shares ts_asof's native-ASOF oracle), and a real watermarked
  * multi-batch stream must emit exactly the batch answer for every
  * row it finalizes, with only the above-watermark tail pending.
  */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bounded streaming as-of equals the batch window operator row-for-row") {
    val batch = graft.queries.TimeSeriesQueries.tsAsof(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val stream = graft.queries.TimeSeriesQueries.streamAsof(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(stream.length == batch.length)
    assert(stream.toSeq == batch.toSeq)
  }

  test("watermarked multi-batch stream emits the batch answer; only the tail stays pending") {
    val inDir = Files.createTempDirectory("asof_in").toString
    val ev = graft.Tables(spark, dir, "events")
      .select($"user_id".as("key"), unix_millis($"ts").as("tsMs"), $"event_id".as("rid"))
    val tagged = ev.withColumn("isRight", lit(false))
      .unionByName(ev.filter($"rid" % 10 === 0).withColumn("isRight", lit(true)))
      .select($"key", $"tsMs", $"isRight", $"rid")
    // three arrival waves split by time tertile — the watermark advances
    // across micro-batches the way a live, roughly-ordered feed drives it
    val cuts = tagged.stat.approxQuantile("tsMs", Array(0.33, 0.66), 0.001)
    Seq(
      tagged.filter($"tsMs" <= cuts(0)),
      tagged.filter($"tsMs" > cuts(0) && $"tsMs" <= cuts(1)),
      tagged.filter($"tsMs" > cuts(1))
    ).zipWithIndex.foreach { case (part, i) =>
      part.coalesce(1).write.parquet(s"$inDir/wave$i")
    }
    val sdf = spark.readStream
      .schema("key LONG, tsMs LONG, isRight BOOLEAN, rid LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/wave*")
      .withColumn("ts", timestamp_millis($"tsMs"))
      .withWatermark("ts", "1 second")
      .as[StreamingAsOf.In]
    val q = StreamingAsOf.joinStream(spark, sdf)
      .writeStream.format("memory").queryName("asof_stream_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream did not finish within 60s")

    val emitted = spark.table("asof_stream_out").collect()
      .map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val batch = graft.queries.TimeSeriesQueries.tsAsof(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // every emitted row must equal the batch answer exactly
    emitted.foreach { case (eid, got) =>
      assert(batch(eid) == got, s"event $eid: stream=$got batch=${batch(eid)}")
    }
    // at least the first two waves finalize (the watermark passes them
    // when wave 3 arrives); only the above-watermark tail may pend
    assert(emitted.size.toDouble / batch.size > 0.5,
      s"only ${emitted.size}/${batch.size} rows emitted")
    assert(emitted.exists(_._2._3.isDefined) && emitted.exists(_._2._3.isEmpty),
      "fixture must exercise matched and unmatched rows")
  }
}
