package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External-decoder hook (round 4) for the codec families the JDK
  * genuinely lacks (MP3/AAC/Vorbis audio; H.264/H.265/VP9 video). A
  * real deployment backs this with a libav/javacv JNI binding; this
  * file pins everything SPARK cares about so that binding is a pure
  * drop-in:
  *
  *  - '''Lifecycle''': decoders hold native contexts, so an instance
  *    is created ONCE per partition inside `mapPartitions` from a
  *    serializable FACTORY (a plain function), used for every batch in
  *    the partition, and `close()`d when the partition ends — even on
  *    failure. An instance never rides a closure to the executors and
  *    never exists on the driver.
  *  - '''Batching''': rows stream through in bounded `batchSize`
  *    groups (the [[Multimodal.decodeBatched]] shape) so peak memory
  *    is batchSize × payload, never the partition.
  *  - '''Schemas''': outputs match the JDK paths exactly —
  *    audio features (id, n_samples, peak, mean_abs, decoded flag)
  *    mirror [[Multimodal.audioFeatureBatch]]; frame sampling emits
  *    (id, frame_idx, frame) exactly like
  *    [[Multimodal.sampleVideoFrames]] — so swapping a stub for a real
  *    codec changes zero downstream plans.
  *  - '''Fallback composition''': a payload the external decoder does
  *    not recognize falls back to the JDK kernel's behavior, so mixed
  *    media batches never fork the plan.
  */
trait ExternalDecoder extends AutoCloseable {

  /** Cheap payload recognition — container sniff only, no full decode. */
  def accepts(bytes: Array[Byte]): Boolean

  /** bytes → normalized PCM samples in [-1, 1]; None when the payload
    * is not this decoder's format or is corrupt.
    */
  def decodeAudio(bytes: Array[Byte]): Option[Array[Double]]

  /** bytes → every k-th decoded frame as a self-contained still image
    * payload (JPEG/PNG bytes the image path can decode); empty when
    * not recognized.
    */
  def decodeVideoFrames(bytes: Array[Byte], everyK: Int): Seq[Array[Byte]]

  /** Release native contexts. Idempotent. */
  def close(): Unit
}

object ExternalDecoder {

  /** Audio features through an external decoder, with the JDK
    * RIFF/WAVE kernel as the in-batch fallback: output schema is
    * identical to the media_audio path ((id, n_samples, peak,
    * mean_abs, decoded) per payload).
    */
  def audioFeatures(df: DataFrame, idCol: String, bytesCol: String,
                    factory: () => ExternalDecoder,
                    batchSize: Int = 64): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("string"), col(bytesCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val dec = factory() // once per partition, on the executor
        val out = it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val ext =
              if (dec.accepts(bytes)) dec.decodeAudio(bytes) else None
            val viaJdk = ext.map { samples =>
              var peak = 0.0; var sumAbs = 0.0; var i = 0
              while (i < samples.length) {
                val a = math.abs(samples(i))
                if (a > peak) peak = a
                sumAbs += a
                i += 1
              }
              (samples.length.toLong, peak,
                if (samples.isEmpty) 0.0 else sumAbs / samples.length)
            }.orElse(AudioCodec.decodeStats(bytes))
            viaJdk match {
              case Some((n, peak, meanAbs)) => (id, n, peak, meanAbs, true)
              case None => (id, 0L, 0.0, 0.0, false)
            }
          }
        }
        // mapPartitions iterators are consumed lazily: closing the
        // decoder only after exhaustion (and on failure) needs the
        // wrap-up below, not a try/finally around the return
        new Iterator[(String, Long, Double, Double, Boolean)] {
          private var closed = false
          private def closeOnce(): Unit =
            if (!closed) { closed = true; dec.close() }
          override def hasNext: Boolean = {
            val h = try out.hasNext catch { case e: Throwable => closeOnce(); throw e }
            if (!h) closeOnce()
            h
          }
          override def next(): (String, Long, Double, Double, Boolean) =
            try out.next() catch { case e: Throwable => closeOnce(); throw e }
        }
      }
      .toDF(idCol, "n_samples", "peak", "mean_abs", "decoded")
  }

  /** Frame sampling through an external decoder, JDK MJPEG-in-AVI
    * walker as fallback: (id, frame_idx, frame) exactly like
    * [[Multimodal.sampleVideoFrames]]. Unrecognized payloads emit no
    * rows (the real path's contract).
    */
  def sampleFrames(df: DataFrame, idCol: String, bytesCol: String,
                   everyK: Int, factory: () => ExternalDecoder): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("string"), col(bytesCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val dec = factory()
        val out = it.flatMap { case (id, bytes) =>
          val frames =
            if (dec.accepts(bytes)) dec.decodeVideoFrames(bytes, everyK)
            else VideoCodec.sampleFrames(bytes, everyK)
          frames.zipWithIndex.map { case (f, i) => (id, i * everyK, f) }
        }
        new Iterator[(String, Int, Array[Byte])] {
          private var closed = false
          private def closeOnce(): Unit =
            if (!closed) { closed = true; dec.close() }
          override def hasNext: Boolean = {
            val h = try out.hasNext catch { case e: Throwable => closeOnce(); throw e }
            if (!h) closeOnce()
            h
          }
          override def next(): (String, Int, Array[Byte]) =
            try out.next() catch { case e: Throwable => closeOnce(); throw e }
        }
      }
      .toDF(idCol, "frame_idx", "frame")
  }
}
