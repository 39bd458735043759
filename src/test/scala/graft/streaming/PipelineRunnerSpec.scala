package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("run/status/stop lifecycle per project; restart reuses the checkpoint") {
    val in = Files.createTempDirectory("pr_in").toString
    val out = Files.createTempDirectory("pr_out").toString
    val cp = Files.createTempDirectory("pr_cp").toString
    val data = Seq(("a", 1.0), ("b", 2.0)).toDF("doc_id", "v")
    data.write.mode("overwrite").parquet(in)

    val q = PipelineRunner.run(spark, "proj1", in, data.schema,
      df => df.withColumn("tagged", lit(true)), out, cp)
    assert(PipelineRunner.projects.contains("proj1"))
    PipelineRunner.await("proj1", 60000)
    assert(spark.read.parquet(out).count() == 2)

    // restart: checkpoint prevents reprocessing; status reflects state
    PipelineRunner.run(spark, "proj1", in, data.schema,
      df => df.withColumn("tagged", lit(true)), out, cp)
    PipelineRunner.await("proj1", 60000)
    assert(spark.read.parquet(out).count() == 2)
    val st = PipelineRunner.status("proj1")
    assert(st.isDefined && !st.get.running) // AvailableNow drained and stopped

    assert(PipelineRunner.stop("proj1"))
    assert(!PipelineRunner.stop("proj1")) // idempotent
    assert(PipelineRunner.status("proj1").isEmpty)
  }
}
