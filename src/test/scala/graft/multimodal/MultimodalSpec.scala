package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "short payload"),
    (2L, "a considerably longer payload " * 10))
    .toDF("id", "txt")
    .withColumn("bytes", $"txt".cast("binary"))

  private def images = Seq(
    (1L, ImageCodec.encodePng(20, 10, 100)),
    (2L, ImageCodec.encode(31, 23, 255, 1)), // bmp
    (3L, ImageCodec.encode(8, 8, 0, 2)))     // gif
    .toDF("id", "bytes")

  test("decodeImage: real header metadata for images, nulls for non-images") {
    val out = images.withColumn("meta", Multimodal.decodeImage($"bytes"))
      .select($"id", $"meta.format", $"meta.width", $"meta.height", $"meta.n_frames")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "png", 20, 10, 1)))
    assert(out(1) == ((2L, "bmp", 31, 23, 1)))
    assert(out(2) == ((3L, "gif", 8, 8, 1)))
    // non-image payload: null struct fields, no crash
    val none = media.withColumn("meta", Multimodal.decodeImage($"bytes"))
      .select($"meta.format").collect()
    assert(none.forall(_.isNullAt(0)))
  }

  test("resizeImages: real pixel resize re-encodes at the target dims") {
    val out = Multimodal.resizeImages(images, "id", "bytes", 224, 112)
    val m = out.select($"id", $"meta.format", $"meta.width", $"meta.height").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(m.length == 3)
    assert(m.forall { case (_, f, w, h) => f == "png" && w == 224 && h == 112 })
    // constant-color input stays constant through bilinear resize
    val resized = out.filter($"id" === "1").select($"resized").head().getAs[Array[Byte]](0)
    assert(ImageCodec.decodeStats(resized).contains((224, 112, 100)))
    // non-image payload passes through unchanged
    val passthru = Multimodal.resizeImages(media, "id", "bytes", 50, 50)
      .select($"id", octet_length($"resized")).collect()
    assert(passthru.length == 2)
  }

  test("frame sampling explodes every k-th frame index") {
    val out = media.withColumn("frames", Multimodal.sampleFrames($"bytes", 2))
    val f = out.select($"id", explode($"frames").as("frame"))
    assert(f.filter($"id" === 1).count() >= 1)
  }

  test("size-aware repartition keeps all rows") {
    val out = Multimodal.repartitionBySize(media, "bytes", 64)
    assert(out.count() == media.count())
  }

  test("batched decode: real image kernel, bounded batches, fallback for non-images") {
    val many = (1L to 200L).map { i =>
      (i, ImageCodec.encodePng((i % 24 + 8).toInt, (i % 16 + 8).toInt, (i % 256).toInt))
    }.toDF("id", "bytes").repartition(4)
    // instrumented decode: record every batch size it was called with
    // (accumulator: closures are serialized per task even in local mode)
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val out = Multimodal.decodeBatched(many, "id", "bytes", batchSize = 16,
      decodeBatch = { batch =>
        sizes.add(batch.size)
        Multimodal.imageFeatureBatch(batch)
      }).collect()
    assert(out.length == 200)
    assert(out.forall(_.getAs[Seq[Float]]("features").length == 4))
    // REAL decoded dimensions and mean pixel match the synthesis params
    out.foreach { r =>
      val i = r.getString(0).toLong
      val f = r.getAs[collection.Seq[Float]]("features")
      assert(f(0) == (i % 24 + 8).toFloat && f(1) == (i % 16 + 8).toFloat)
      assert(f(2) == (i % 256).toFloat)
      assert(f(3) == 1f) // decoded as image, not fallback
    }
    // every batch the codec saw is bounded by batchSize; ids all survive
    val seen = sizes.value
    assert(seen.size() > 4)
    seen.forEach(s => assert(s >= 1 && s <= 16))
    assert(out.map(_.getString(0).toLong).sorted.sameElements(1L to 200L))
    // non-image payloads take the tagged byte-stats fallback
    val fallback = Multimodal.decodeBatched(media, "id", "bytes").collect()
    assert(fallback.forall(_.getAs[Seq[Float]]("features").last == 0f))
  }
}
