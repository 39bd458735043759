package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.{AudioCodec, ImageCodec}

/** Streaming × multimodal composition: binary media payloads flow
  * through Structured Streaming with the same codegen'd metadata
  * expressions as the batch plane — the "continuously ingest a media
  * table, extract typed metadata" pipeline shape. Uses the
  * `binaryFile` streaming source (each file = one payload row), so the
  * 100 TB analogue is a landing bucket of media objects.
  */
class StreamMediaSpec extends SparkSpec {

  private val BinSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))

  test("binaryFile stream -> image/audio metadata structs -> sink, exactly once") {
    val inDir = Files.createTempDirectory("media_in").toString
    val outDir = Files.createTempDirectory("media_out").toString
    val ckDir = Files.createTempDirectory("media_ck").toString
    // three real payloads: two images, one WAV
    Files.write(java.nio.file.Paths.get(inDir, "a.png"), ImageCodec.encodePng(12, 7, 30))
    Files.write(java.nio.file.Paths.get(inDir, "b.png"), ImageCodec.encodePng(5, 9, 200))
    Files.write(java.nio.file.Paths.get(inDir, "c.wav"), AudioCodec.encodePcm16(100, 8000, 1000, 10))

    val q = spark.readStream
      .format("binaryFile")
      .schema(BinSchema)
      .load(inDir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        ImageCodec.imageMeta(col("content")).as("img"),
        AudioCodec.audioMeta(col("content")).as("aud"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream did not finish within 60s")

    val out = spark.read.parquet(outDir)
      .select(col("name"), col("img.format"), col("img.width"), col("img.height"),
        col("aud.sample_rate"), col("aud.n_samples"))
      .collect()
      .map(r => (r.getString(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5)))
      .sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == (("a.png", "png", 12, 7, null, null)))
    assert(out(1) == (("b.png", "png", 5, 9, null, null)))
    assert(out(2)._1 == "c.wav" && out(2)._2 == null &&
      out(2)._5 == 8000 && out(2)._6 == 100L)

    // restart with the same checkpoint + no new files: no duplicates
    val q2 = spark.readStream.format("binaryFile").schema(BinSchema).load(inDir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        ImageCodec.imageMeta(col("content")).as("img"),
        AudioCodec.audioMeta(col("content")).as("aud"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(60000), "stream did not finish within 60s")
    assert(spark.read.parquet(outDir).count() == 3)
  }
}
