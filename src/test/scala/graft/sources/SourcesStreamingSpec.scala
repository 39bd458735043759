package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamPipeline

class SourcesStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_test").toString

  test("S1 json-lines source reads one doc per line") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.jl"),
      """{"doc_id":"a","raw_content":"<p>x</p>"}
        |{"doc_id":"b","raw_content":"<p>y</p>"}""".stripMargin)
    val df = Sources.jsonLines(spark, dir)
    assert(df.count() == 2)
    assert(df.select("doc_id").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("S2 csv source keeps all columns as strings (no type detection)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.csv"),
      "A,B 1\n1,x\n2,y\n")
    val df = Sources.csv(spark, dir)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 2)
  }

  test("S6 raw-dir pairs join json metadata with html payload by stem") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/p1.json"), """{"doc_id":"p1","t":"a"}""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/p1.html"), "<html>one</html>")
    Files.writeString(java.nio.file.Paths.get(s"$dir/p2.json"), """{"doc_id":"p2","t":"b"}""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/p2.html"), "<html>two</html>")
    val df = Sources.rawDirPairs(spark, dir).orderBy("doc_id")
    assert(df.count() == 2)
    assert(df.select("raw_content").as[String].collect().head.contains("one"))
  }

  test("S9/A5 upsert keeps last write per doc_id") {
    val existing = Seq(("d1", 1L, "old"), ("d2", 1L, "keep")).toDF("doc_id", "v", "x")
    val incoming = Seq(("d1", 2L, "new"), ("d3", 1L, "add")).toDF("doc_id", "v", "x")
    val out = Sources.upsert(Some(existing), incoming, "doc_id", "v")
      .orderBy("doc_id").select("x").as[String].collect()
    assert(out.toSeq == Seq("new", "keep", "add"))
  }

  test("upsert version ties resolve by the content-hash contract, not input order") {
    import org.apache.spark.sql.functions.{struct, to_json, xxhash64}
    // 10 tie groups, conflicting content at the same version: the
    // winner of EACH group must be its hash-argmin — with the tiebreak
    // removed, stable input order would pick 'a$i' for every group,
    // which disagrees with the hash-argmin for ~half the groups
    val existing = (1 to 10).map(i => (s"d$i", 1L, s"a$i")).toDF("doc_id", "v", "x")
    val incoming = (1 to 10).map(i => (s"d$i", 1L, s"b$i")).toDF("doc_id", "v", "x")
    val both = existing.unionByName(incoming)
    val expected = both
      .withColumn("__h", xxhash64(to_json(struct($"doc_id", $"v", $"x"))))
      .groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.min_by($"x", $"__h").as("x"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val got = Sources.upsert(Some(existing), incoming, "doc_id", "v")
      .select("doc_id", "x").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == expected, "winner must be the per-group content-hash argmin")
    assert(expected.values.exists(_.startsWith("b")),
      "fixture too weak: at least one hash-argmin should differ from input order")
  }

  test("streamingDedup drops duplicate content through a real streaming query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val src = mem.toDF().toDF("id", "ts", "text")
    val q = graft.operators.Dedup.streamingDedup(src, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode(OutputMode.Append()).start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    mem.addData((1L, t0, "same"), (2L, t1, "same"), (3L, t1, "other"))
    q.processAllAvailable()
    mem.addData((4L, t1, "same")) // still within state: deduped
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sdedup_out").select("text").as[String].collect()
    assert(out.sorted.toSeq == Seq("other", "same"))
  }

  test("toCdr wraps rows with nested payload, hash doc_id, dataset tag") {
    val df = Seq(("r1", 5)).toDF("name", "n")
    val cdr = Sources.toCdr(df, "acme", "file:///data.csv")
    val row = cdr.collect().head
    assert(cdr.columns.toSet == Set("acme", "raw_content", "doc_id", "url", "dataset"))
    assert(row.getAs[String]("doc_id").length == 64)
    assert(row.getAs[String]("url").startsWith("file:///data.csv#"))
  }

  test("ST1/ST2 file stream applies the batch transform incrementally with checkpoint") {
    val in = tmp(); val out = tmp(); val cp = tmp()
    val data = Seq(("a", 1.0), ("", 2.0), ("c", 3.0)).toDF("doc_id", "v")
    data.write.mode("overwrite").parquet(in)
    val q = StreamPipeline.fileStream(spark, in, data.schema,
      df => StreamPipeline.withDeadLetter(df, StreamPipeline.validDocId(col("doc_id"))),
      out, cp)
    assert(q.awaitTermination(60000), "stream did not finish within 60s")
    val res = spark.read.parquet(out)
    assert(res.count() == 3)
    assert(res.filter(col("__dead")).count() == 1) // empty doc_id dead-lettered
    // restart with no new files: checkpoint prevents reprocessing
    val q2 = StreamPipeline.fileStream(spark, in, data.schema,
      df => StreamPipeline.withDeadLetter(df, StreamPipeline.validDocId(col("doc_id"))),
      out, cp)
    assert(q2.awaitTermination(60000), "stream did not finish within 60s")
    assert(spark.read.parquet(out).count() == 3)
  }

  test("O2 tld quota caps docs per tld") {
    val df = Seq(("t1", 1), ("t1", 2), ("t1", 3), ("t2", 1)).toDF("tld", "seq")
    val out = StreamPipeline.tldQuota(df, "tld", "seq", 2)
    assert(out.groupBy("tld").count().orderBy("tld")
      .select("count").as[Long].collect().toSeq == Seq(2, 1))
  }
}
