package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming KMV sketch: bounded mode equals the batch sketch, a real
  * multi-batch stream converges to the same kept set, θ emissions are
  * monotone decreasing, and a full replay emits nothing.
  */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  test("bounded mode equals the batch sketch per group") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.Relational.sketchKmv(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val got = graft.queries.Relational.streamKmv(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == batch)
  }

  test("multi-batch stream: final kept set equals batch, theta monotone, replay silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val in = mem.toDF().toDF("v")
      .select(lit("g").as("grp"),
        graft.queries.Relational.kmvHash($"v").as("h"), $"v".as("id"))
      .as[StreamingKmv.KmvIn]
    val q = StreamingKmv.sketch(spark, in)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode(OutputMode.Append()).start()
    mem.addData(1L to 100L: _*)
    q.processAllAvailable()
    mem.addData(50L to 300L: _*) // overlap: dup ids must not distort the kept set
    q.processAllAvailable()
    mem.addData(1L to 300L: _*)  // full replay: nothing new -> no emission
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("kmv_out").as[StreamingKmv.KmvOut].collect()
    // exactly two emissions (one per state-changing batch)
    assert(emitted.length == 2, s"got ${emitted.length} emissions")
    val thetas = emitted.flatMap(_.theta)
    assert(thetas.sorted.reverse.sameElements(thetas), "theta must only decrease")
    // final state via the monotone recovery = batch KMV over 1..300
    val finalN = emitted.map(_.nKept).max
    val finalTheta = if (thetas.isEmpty) None else Some(thetas.min)
    val expected = (1L to 300L).toDF("v")
      .select(graft.queries.Relational.kmvHash($"v").as("h"), $"v".as("id"))
      .orderBy($"h", $"id").limit(StreamingKmv.K)
      .collect().map(r => r.getDouble(0))
    assert(finalN == expected.length)
    assert(finalTheta == (if (expected.length == StreamingKmv.K)
      Some(expected.last) else None))
  }
}
