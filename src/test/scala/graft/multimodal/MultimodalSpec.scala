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

  test("binary payload + stubbed decode produces typed metadata struct") {
    val out = media.withColumn("meta", Multimodal.decodeImageStub($"bytes"))
    val m = out.select($"meta.format", $"meta.width", $"meta.height").collect()
    assert(m.forall(_.getString(0) == "fake/rgb8"))
    assert(m.forall(r => r.getInt(1) >= 1 && r.getInt(2) >= 1))
    // deterministic: same payload -> same metadata
    val again = media.withColumn("meta", Multimodal.decodeImageStub($"bytes"))
      .select($"meta.width").as[Int].collect()
    assert(again.toSeq == out.select($"meta.width").as[Int].collect().toSeq)
  }

  test("resize stub updates metadata, passes payload through") {
    val out = media
      .withColumn("meta", Multimodal.decodeImageStub($"bytes"))
      .withColumn("resized", Multimodal.resizeStub($"bytes", $"meta", 224, 224))
    val r = out.select($"resized.width", $"resized.height").collect().head
    assert(r.getInt(0) == 224 && r.getInt(1) == 224)
    assert(out.select(octet_length($"resized.bytes")).as[Int].collect().toSeq ==
      out.select(octet_length($"bytes")).as[Int].collect().toSeq)
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

  test("batched decode: batch shape bounded, per-row features, schema preserved") {
    val many = (1L to 200L).map(i => (i, s"payload $i ${"x" * (i % 37).toInt}"))
      .toDF("id", "txt").withColumn("bytes", $"txt".cast("binary"))
      .repartition(4)
    // instrumented decode: record every batch size it was called with
    // (accumulator: closures are serialized per task even in local mode)
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val out = Multimodal.decodeBatched(many, "id", "bytes", batchSize = 16,
      decodeBatch = { batch =>
        sizes.add(batch.size)
        Multimodal.stubDecodeBatch(batch)
      }).collect()
    assert(out.length == 200)
    assert(out.forall(_.getAs[Seq[Float]]("features").length == 4))
    // every batch the codec saw is bounded by batchSize; ids all survive
    val seen = sizes.value
    assert(seen.size() > 4)
    seen.forEach(s => assert(s >= 1 && s <= 16))
    // string ids (the doc_id convention is sha256 hex — longs would null)
    assert(out.map(_.getString(0).toLong).sorted.sameElements(1L to 200L))
    // deterministic stub: same payload -> same vector
    val again = Multimodal.decodeBatched(many, "id", "bytes", batchSize = 16).collect()
    assert(again.map(r => (r.getString(0), r.getAs[Seq[Float]]("features"))).toMap ==
      out.map(r => (r.getString(0), r.getAs[Seq[Float]]("features"))).toMap)
  }
}
