package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder brief): image/audio/video as opaque
  * `binary` columns with typed metadata structs.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real; the codec itself is STUBBED deterministically (image/audio
  * libraries are not in this container). On a real cluster the stub
  * body is replaced by a JNI/javacv decode with the same signature;
  * everything around it (the narrow mapPartitions batch shape, the
  * metadata struct schema, size-aware repartitioning) is unchanged.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  val MetaSchema = "struct<format:string,width:int,height:int,n_frames:int,sample_rate:int>"

  /** Wrap a text/binary column as a media payload (binary + mime tag). */
  def asMedia(payload: Column, mime: String): Column =
    struct(
      payload.cast("binary").as("bytes"),
      lit(mime).as("mime"))

  /** STUB image decode: derives deterministic metadata from the payload
    * bytes (`???`-equivalent marked fake; real impl: image codec).
    * Stays a per-row expression so the plan shape matches a codegen'd
    * decode.
    */
  def decodeImageStub(bytes: Column): Column = {
    val n = octet_length(bytes)
    struct(
      lit("fake/rgb8").as("format"),
      (pmod(n, lit(640)) + 1).cast("int").as("width"),
      (pmod(n, lit(480)) + 1).cast("int").as("height"),
      lit(1).as("n_frames"),
      lit(0).as("sample_rate"))
  }

  /** STUB resize: real impl transforms pixels; the stub keeps the
    * contract (metadata updated, payload passed through).
    */
  def resizeStub(bytes: Column, meta: Column, w: Int, h: Int): Column =
    struct(
      bytes.as("bytes"),
      meta.getField("format").as("format"),
      lit(w).cast("int").as("width"),
      lit(h).cast("int").as("height"))

  /** STUB frame sampling for video: pick every k-th "frame" (here: k-th
    * 1KiB chunk index) — demonstrates the explode shape a real frame
    * sampler produces (one row per sampled frame).
    */
  def sampleFrames(bytes: Column, everyK: Int): Column = {
    val nFrames = greatest(floor(octet_length(bytes) / 1024).cast("int"), lit(1))
    filter(sequence(lit(0), nFrames - 1), i => pmod(i, lit(everyK)) === 0)
  }

  /** Size-aware layout: media tables must spread payload BYTES evenly so
    * a few huge blobs don't skew tasks (100 TB guidance: target
    * `spark.sql.files.maxPartitionBytes`-sized groups).
    *
    * The size bucket alone is the wrong partition key — nearly all rows
    * share bucket 0, so hashing it CONCENTRATES similar-sized blobs
    * instead of spreading them. A payload-hash salt inside each size
    * class makes bytes-per-partition uniform in expectation: small
    * blobs scatter, and each over-target blob lands alone wherever its
    * salt sends it.
    */
  def repartitionBySize(df: DataFrame, bytesCol: String, targetPartitionBytes: Long,
                        saltBuckets: Int = 64): DataFrame =
    df.withColumn("__b",
        floor(octet_length(col(bytesCol)) / lit(targetPartitionBytes.toDouble)).cast("int"))
      .withColumn("__salt", pmod(xxhash64(col(bytesCol)), lit(saltBuckets)))
      .repartition(col("__b"), col("__salt"))
      .drop("__b", "__salt")
}
