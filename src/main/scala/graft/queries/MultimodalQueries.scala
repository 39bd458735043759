package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column plumbing exercised on real tables: the documents
  * payload treated as an opaque binary column, decoded by the stubbed
  * codec into typed metadata, with frame-sampling counts (builder brief:
  * the Spark-side schema/batch shape is real; the codec is a
  * deterministic fake).
  */
object MultimodalQueries {

  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .withColumn("bytes", col("text").cast("binary"))
      .withColumn("meta", Multimodal.decodeImageStub(col("bytes")))
    docs.select(
      col("doc_id"),
      octet_length(col("bytes")).as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      size(Multimodal.sampleFrames(col("bytes"), 2)).as("n_sampled"))
      .orderBy(col("doc_id"))
  }

  val mediaMetaSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
      |  CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
      |  CAST(len(list_filter(range(greatest(octet_length(encode(text)) // 1024, 1)),
      |    i -> i % 2 = 0)) AS INT) AS n_sampled
      |FROM documents ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta" -> (mediaMeta _))

  val oracles: Map[String, String] = Map(
    "media_meta" -> mediaMetaSql)
}
