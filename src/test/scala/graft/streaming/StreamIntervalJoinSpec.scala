package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming range join certified two ways, mirroring
  * StreamAsOfSpec: bounded mode must equal the batch bucketized
  * operator pair-for-pair (that equivalence is ALSO the DuckDB oracle
  * gate — stream_range_join shares ts_range_join's native range-join
  * oracle), and a real watermarked multi-batch stream must emit
  * exactly the batch pairs for every point it finalizes.
  */
class StreamIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bounded streaming range join equals the batch bucketized operator pair-for-pair") {
    val batch = graft.queries.TimeSeriesQueries.tsRangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val stream = graft.queries.TimeSeriesQueries.streamRangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(stream.length == batch.length && stream.nonEmpty)
    assert(stream.toSeq == batch.toSeq)
  }

  test("watermarked multi-batch stream emits the batch pairs; only the tail stays pending") {
    val inDir = Files.createTempDirectory("ivj_in").toString
    val ev = graft.Tables(spark, dir, "events")
      .select($"user_id".as("key"), unix_millis($"ts").as("ts_ms"), $"event_id")
    val points = ev.select($"key", $"ts_ms".as("startMs"), $"ts_ms".as("endMs"),
      lit(false).as("isInterval"), $"event_id".as("rid"))
    val intervals = ev.filter($"event_id" % 10 === 0)
      .groupBy($"key", $"ts_ms").agg(max($"event_id").as("m_id"))
      .select($"key", $"ts_ms".as("startMs"), ($"ts_ms" + 21600000L).as("endMs"),
        lit(true).as("isInterval"), $"m_id".as("rid"))
    val tagged = points.unionByName(intervals)
    val cuts = tagged.stat.approxQuantile("startMs", Array(0.33, 0.66), 0.001)
    Seq(
      tagged.filter($"startMs" <= cuts(0)),
      tagged.filter($"startMs" > cuts(0) && $"startMs" <= cuts(1)),
      tagged.filter($"startMs" > cuts(1))
    ).zipWithIndex.foreach { case (part, i) =>
      part.coalesce(1).write.parquet(s"$inDir/wave$i")
    }
    val sdf = spark.readStream
      .schema("key LONG, startMs LONG, endMs LONG, isInterval BOOLEAN, rid LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/wave*")
      .withColumn("ts", timestamp_millis($"startMs"))
      .withWatermark("ts", "1 second")
      .as[StreamingIntervalJoin.In]
    val q = StreamingIntervalJoin.joinStream(spark, sdf)
      .writeStream.format("memory").queryName("ivj_stream_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream did not finish within 60s")

    val emitted = spark.table("ivj_stream_out").collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> ((r.getLong(0), r.getLong(1), r.getLong(4))))
      .toMap
    val batch = graft.queries.TimeSeriesQueries.tsRangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    emitted.foreach { case (pair, got) =>
      assert(batch(pair) == got, s"pair $pair: stream=$got batch=${batch(pair)}")
    }
    assert(emitted.size.toDouble / batch.size > 0.5,
      s"only ${emitted.size}/${batch.size} pairs emitted")
  }
}
