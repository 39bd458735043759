package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Sketches

/** Streaming CMS: bounded mode equals the batch sketch, a multi-batch
  * stream's final counters equal the batch counters over the union,
  * and running totals are strictly monotone per counter.
  */
class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  test("bounded mode equals the batch sketch_cms output") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.TextOps.streamCms(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.queries.TextOps.sketchCms(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == batch)
  }

  test("multi-batch stream: final counters equal batch counters, emissions monotone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    def buckets = posexplode(array((0 until Sketches.CmsD).map(i =>
      Sketches.cmsBucket($"tok", i)): _*))
    val in = mem.toDF().toDF("tok").select(buckets)
      .select($"pos".as("row"), $"col".as("bucket"), lit(1L).as("w"))
      .as[StreamingCms.CntIn]
    val q = StreamingCms.counters(spark, in)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Append()).start()
    val b1 = Seq("a", "b", "a", "c", "a")
    val b2 = Seq("b", "b", "d", "a")
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("cms_out").as[StreamingCms.CntOut].collect()
    // strict monotonicity: a counter's emissions are all distinct and
    // increasing in arrival order is implied by distinctness + additivity
    emitted.groupBy(e => (e.row, e.bucket)).foreach { case (k, es) =>
      assert(es.map(_.c).distinct.length == es.length, s"counter $k re-emitted")
    }
    val finalCnt = emitted.groupBy(e => (e.row, e.bucket))
      .map { case (k, es) => k -> es.map(_.c).max }
    val expected = (b1 ++ b2).toDF("tok").select(buckets)
      .select($"pos".as("row"), $"col".as("bucket"))
      .groupBy($"row", $"bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(finalCnt == expected)
  }
}
