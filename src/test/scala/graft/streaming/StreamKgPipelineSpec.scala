package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extract.Extractors
import graft.sources.Sources

/** End-to-end streaming KG pipeline (SURVEY §3.2 collapsed into one
  * streaming plan): corpus stream → glossary extraction → long-format
  * KG rows → parquet sink, then the idempotent upsert merge (S9) —
  * the reference's etk_worker + logstash + ES loop as one query.
  */
class StreamKgPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stream -> extraction -> KG long rows -> sink -> upsert") {
    val in = Files.createTempDirectory("kg_in").toString
    val out = Files.createTempDirectory("kg_out").toString
    val cp = Files.createTempDirectory("kg_cp").toString
    val docs = Seq(
      (1L, "fast hash join on the big table"),
      (2L, "slow scan with small filter"),
      (3L, "merge sort window")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(in)

    val extract: DataFrame => DataFrame = d =>
      Extractors.toKgValues(d, "doc_id", Seq(
        ("op", Extractors.glossary(col("text"), Seq("join", "scan", "sort")), "dict", "content"),
        ("speed", Extractors.glossary(col("text"), Seq("fast", "slow")), "dict", "content")))

    val q = StreamPipeline.fileStream(spark, in, docs.schema, extract, out, cp)
    assert(q.awaitTermination(60000), "stream did not finish within 60s")

    val kg = spark.read.parquet(out)
    assert(kg.count() == 5) // docs 1-2: op+speed; doc 3: op only
    assert(kg.filter($"field" === "op").count() == 3)
    assert(kg.filter($"field" === "speed").count() == 2)
    assert(kg.columns.toSet ==
      Set("doc_id", "field", "value", "key", "method", "segment", "confidence"))

    // S9 upsert at doc granularity: re-delivering doc 1 replaces ALL its
    // previous KG rows with the new extraction
    val incoming = Seq(("1", "op", "join", "join", "dict2", "content", 1.0))
      .toDF("doc_id", "field", "value", "key", "method", "segment", "confidence")
    val merged = Sources.upsertDocs(kg, incoming, "doc_id")
    assert(merged.filter($"doc_id" === "1").count() == 1)
    assert(merged.filter($"doc_id" === "1").select("method").as[String].collect().head == "dict2")
    assert(merged.count() == 4) // doc1: 2 rows -> 1; docs 2-3 keep 3 rows
  }

  test("E2-at-scale glossaryJoin matches the literal-glossary extractor") {
    val docs = Seq((1L, "Flights to New York and Paris"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val gloss = Seq("new york", "paris", "london").toDF("term")
    val joined = Extractors.glossaryJoin(docs, "doc_id", "text", gloss)
    val m = joined.as[(Long, Seq[String])].collect().toMap
    assert(m(1L).toSet == Set("new york", "paris"))
    assert(!m.contains(2L)) // semi-join semantics: non-matching docs drop
  }

  test("Q10 timeout: fast query returns Right, tight deadline cancels") {
    import graft.query.QueryCompiler
    val fast = QueryCompiler.executeWithTimeout(spark.range(10).toDF(), 30)
    assert(fast.isRight && fast.toOption.get.length == 10)
    val slowDf = spark.range(2000000000L)
      .selectExpr("sum(cast(xxhash64(id, id + 1, id + 2) as double))")
    val slow = QueryCompiler.executeWithTimeout(slowDf, 1, "graft-slow")
    assert(slow.isLeft)
  }
}
