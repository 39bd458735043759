package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.CurationQueries

/** Streaming × curation composition: the quality-gate panels (C4
  * rules, hashed linear classifier, Flesch readability) are stateless
  * column expressions, so the SAME expressions the batch registry
  * queries certify drop into a Structured Streaming plan — the
  * "score documents as they land" pipeline shape. Values are asserted
  * equal to the batch plane on identical rows, and the checkpoint
  * restart must not re-emit.
  */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  test("text stream -> C4/classifier/readability panels -> sink, exactly once, batch-equal") {
    val inDir = Files.createTempDirectory("cur_in").toString
    val outDir = Files.createTempDirectory("cur_out").toString
    val ckDir = Files.createTempDirectory("cur_ck").toString
    val docs = Seq(
      "This first streamed document clearly contains enough words to pass. " +
        "It even has sentences. Three of them, in fact.",
      "short {brace} doc",
      "lorem ipsum dolor sit amet and nothing else of value here.")
    // one file per doc: the text source is line-per-row, and panel
    // inputs here are single-line documents
    docs.zipWithIndex.foreach { case (d, i) =>
      Files.write(java.nio.file.Paths.get(inDir, s"d$i.txt"),
        d.getBytes("UTF-8"))
    }

    def paneled(df: org.apache.spark.sql.DataFrame) = df
      .select(col("value").as("text"),
        CurationQueries.c4Panel(col("value")).as("c4"),
        CurationQueries.classifierPanel(col("value")).as("cls"),
        CurationQueries.readabilityPanel(col("value")).as("rd"),
        CurationQueries.gopherPanel(col("value")).as("gp"))
      .select(col("text"), col("c4.keep").as("c4_keep"),
        col("c4.has_brace").as("has_brace"), col("c4.has_lorem").as("has_lorem"),
        col("cls.score").as("cls_score"), col("cls.keep").as("cls_keep"),
        col("rd.flesch_ease").as("flesch_ease"), col("rd.band").as("band"),
        col("gp.n_words").as("gp_words"), col("gp.keep").as("gp_keep"))

    val q = paneled(spark.readStream.text(inDir))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream did not finish within 60s")

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getDouble(4), r.getBoolean(5), r.getDouble(6), r.getString(7),
        r.getInt(8), r.getBoolean(9)))
      .sortBy(_._1)
    val streamed = rows(spark.read.parquet(outDir))
    val batch = rows(paneled(docs.toDF("value")))
    assert(streamed.length == 3)
    assert(streamed.toSeq == batch.toSeq) // streaming plane ≡ batch plane
    // the gates discriminate on these rows
    val byDoc = streamed.map(t => (t._1.take(10), t)).toMap
    assert(byDoc.exists(_._2._3)) // brace flagged
    assert(byDoc.exists(_._2._4)) // lorem flagged

    // restart on the same checkpoint with no new input: no re-emission
    val q2 = paneled(spark.readStream.text(inDir))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(60000), "stream did not finish within 60s")
    assert(spark.read.parquet(outDir).count() == 3)
  }
}
