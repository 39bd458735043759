package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Sketches

/** Streaming HLL: bounded mode equals the batch sketch, a real
  * multi-batch stream converges to the same registers, and emissions
  * are monotone (a register only ever grows).
  */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private def batchEstimate(dir: String): Map[String, Double] =
    graft.queries.Relational.approxDistinctHll(spark, dir)
      .select($"event_type", $"est").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("bounded mode equals the batch estimate per group") {
    val got = graft.queries.Relational.streamHll(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == batchEstimate("/root/testdata/sf0.001"))
  }

  test("multi-batch stream: final registers equal the batch registers, emissions monotone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val (bucket, rho) = Sketches.hllParts($"v")
    val regs = mem.toDF().toDF("v")
      .select(lit("g").as("grp"), bucket.as("bucket"), rho.as("rho"))
      .as[StreamingHll.RegIn]
    val q = StreamingHll.registers(spark, regs)
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Append()).start()
    mem.addData(1L to 400L: _*)
    q.processAllAvailable()
    mem.addData(200L to 900L: _*) // overlap: duplicates must not grow registers
    q.processAllAvailable()
    mem.addData(1L to 400L: _*)   // full replay: no new emissions at all
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("hll_out").as[StreamingHll.RegOut].collect()
    // a register emits only when it strictly grows, so every emitted
    // value per bucket is distinct (order-free monotonicity witness) —
    // and the full replay in batch 3 added no emissions at all
    emitted.groupBy(_.bucket).foreach { case (b, es) =>
      assert(es.map(_.r).distinct.length == es.length, s"bucket $b re-emitted a value")
    }
    val finalRegs = emitted.groupBy(_.bucket).map { case (b, es) => b -> es.map(_.r).max }
    val expected = (1L to 900L).toDF("v")
      .select(bucket.as("b"), rho.as("r"))
      .groupBy($"b").agg(max($"r").as("r"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(finalRegs == expected)
  }
}
