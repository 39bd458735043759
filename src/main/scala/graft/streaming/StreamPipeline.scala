package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming plane (SURVEY §2.10, ST1–ST7): the reference's per-project
  * `<p>_in` → map → `<p>_out` Kafka pipe re-expressed as Structured
  * Streaming. The extraction plane is a stateless per-document map
  * (ST7: no event-time state), so the streaming query is exactly the
  * batch transform applied incrementally.
  *
  * The reference is at-most-once (commits before processing, ST2); we
  * deliberately improve to checkpointed offsets + idempotent upsert by
  * doc_id (documented deviation, SURVEY §7). File-backed source/sink
  * here; the same wiring takes `format("kafka")` on a cluster with a
  * broker (S7/S8).
  */
object StreamPipeline {

  /** ST1 topology: source stream → per-doc transform → sink, with
    * checkpointing. `maxFilesPerTrigger` plays the reference's
    * `max_poll_records` batching knob (ST3).
    */
  def fileStream(spark: SparkSession, inDir: String, schema: StructType,
                 transform: DataFrame => DataFrame,
                 outDir: String, checkpointDir: String,
                 maxFilesPerTrigger: Int = 10): StreamingQuery = {
    val in = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
    transform(in).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** ST6 failure handling: per-doc try/except → dead-letter routing.
    * Docs failing `validate` go to the `__dead` column instead of
    * killing the stream (the reference logs + skips, etk_worker.py:138).
    */
  def withDeadLetter(df: DataFrame, validate: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("__dead", !coalesce(validate, lit(false)))

  /** doc_id validation (etk_worker.py:93-96): required, non-empty. */
  def validDocId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.isNotNull && length(c.cast("string")) > 0

  /** Event-time windowed counts with a watermark (our documented
    * extension beyond the reference's stateless plane, SURVEY ST7):
    * tumbling windows on the event timestamp, late data bounded by the
    * watermark. Usable identically in batch (window()+groupBy) and
    * streaming (adds state cleanup).
    */
  def windowedCounts(df: DataFrame, tsCol: String, keyCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col(keyCol), col("cnt"))

  /** O2 per-TLD desired quota applied on the stream's micro-batch
    * (docs/index.md:108-114) — via foreachBatch in production; exposed
    * here as the batch transform for reuse.
    */
  def tldQuota(df: DataFrame, tldCol: String, orderCol: String, desired: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(tldCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= desired).drop("__rn")
  }
}
