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
    * contract (FULL MetaSchema carried through with width/height
    * updated, payload passed through — dropping fields would give
    * chained/unioned media frames incompatible struct schemas).
    */
  def resizeStub(bytes: Column, meta: Column, w: Int, h: Int): Column =
    struct(
      bytes.as("bytes"),
      meta.getField("format").as("format"),
      lit(w).cast("int").as("width"),
      lit(h).cast("int").as("height"),
      meta.getField("n_frames").as("n_frames"),
      meta.getField("sample_rate").as("sample_rate"))

  /** STUB frame sampling for video: pick every k-th "frame" (here: k-th
    * 1KiB chunk index) — demonstrates the explode shape a real frame
    * sampler produces (one row per sampled frame).
    */
  def sampleFrames(bytes: Column, everyK: Int): Column = {
    val nFrames = greatest(floor(octet_length(bytes) / 1024).cast("int"), lit(1))
    filter(sequence(lit(0), nFrames - 1), i => pmod(i, lit(everyK)) === 0)
  }

  /** Batched decode plumbing — the Scala analogue of mapInPandas: rows
    * stream through mapPartitions in bounded batches so a real codec
    * can amortize model/library init per batch (not per row) while
    * memory stays bounded by batchSize × payload, never the partition.
    * The decode function itself is the pluggable part: it receives one
    * batch of (id, bytes) and returns per-row feature vectors —
    * STUBBED here as a deterministic byte-derived vector (no codec
    * libs in this container); a javacv/JNI decode drops into the same
    * signature with zero plan changes.
    */
  def decodeBatched(df: DataFrame, idCol: String, bytesCol: String,
                    batchSize: Int = 64,
                    decodeBatch: Seq[(String, Array[Byte])] => Seq[Array[Float]] =
                      stubDecodeBatch): DataFrame = {
    import df.sparkSession.implicits._
    // ids travel as strings: the pipeline's doc_id convention is sha256
    // hex — a long cast would null them and crash the tuple encoder
    df.select(col(idCol).cast("string"), col(bytesCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = decodeBatch(batch)
          batch.iterator.zip(feats.iterator).map { case ((id, _), f) => (id, f) }
        }
      }
      .toDF(idCol, "features")
  }

  /** STUB batch decode: deterministic 4-dim byte statistics per payload
    * (real impl: decode + embed). Marked fake; the batch SHAPE is the
    * tested contract.
    */
  def stubDecodeBatch(batch: Seq[(String, Array[Byte])]): Seq[Array[Float]] =
    batch.map { case (_, bytes) =>
      val n = math.max(1, bytes.length)
      var sum = 0L; var mx = 0; var i = 0
      while (i < bytes.length) { val v = bytes(i) & 0xff; sum += v; if (v > mx) mx = v; i += 1 }
      Array(n.toFloat, (sum.toDouble / n).toFloat, mx.toFloat,
        (bytes.headOption.map(_ & 0xff).getOrElse(0)).toFloat)
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
