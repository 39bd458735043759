package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Robustness matrix: every registered query must EXECUTE (possibly to
  * an empty result) on degenerate corpora the synthetic test data never
  * contains — empty tables, and edge rows (null text, empty text,
  * single-token docs, a single user/vector). The oracle harness proves
  * value parity on well-formed data; this spec pins the failure mode on
  * malformed data to "empty/partial result", never a crash (the
  * probeDim-on-empty-corpus class of bug).
  */
class EdgeCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val tmpDirs = scala.collection.mutable.ArrayBuffer[String]()

  override def afterAll(): Unit = {
    tmpDirs.foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    }
    super.afterAll()
  }

  /** Clone the sf0.001 schemas with given per-table row filters. */
  private def writeCorpus(suffix: String, keepRows: Boolean): String = {
    val src = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory(s"edge_$suffix").toString
    tmpDirs += out
    Tables.names.foreach { n =>
      val df = spark.read.parquet(s"$src/$n.parquet")
      val base = if (keepRows) df.limit(2) else df.limit(0)
      base.write.mode(SaveMode.Overwrite).parquet(s"$out/$n.parquet")
    }
    out
  }

  /** Run every registry query against `dir`, harvesting crashes. */
  private def crashes(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
    }

  test("every registered query runs on an EMPTY corpus without throwing") {
    val failures = crashes(writeCorpus("empty", keepRows = false))
    assert(failures.isEmpty, s"queries crashed on empty corpus:\n${failures.mkString("\n")}")
  }

  test("every registered query runs on an edge-row corpus (null/empty/1-token text) without throwing") {
    val src = "/root/testdata/sf0.001"
    val dir = writeCorpus("edge", keepRows = true)
    // overwrite documents with pathological rows (schema-compatible)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val edgeDocs = docs.limit(4).collect()
    val schema = docs.schema
    val rows = Seq(
      org.apache.spark.sql.Row(900L, null, "en", "srcE", 0L), // null text
      org.apache.spark.sql.Row(901L, "", "en", "srcE", 0L), // empty text
      org.apache.spark.sql.Row(902L, "one", "en", "srcE", 3L), // 1 token (no shingles)
      org.apache.spark.sql.Row(903L, "a a a a a a a a", "xx", "srcF", 15L)) // degenerate repetition
    val edge = spark.createDataFrame(
      spark.sparkContext.parallelize(rows ++ edgeDocs.toSeq), schema)
    edge.write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    // embeddings: a single vector (self-join/ANN paths) + a null embedding
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.limit(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    // events: one user with one event (single-point series)
    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.limit(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")

    val failures = crashes(dir)
    assert(failures.isEmpty, s"queries crashed on edge corpus:\n${failures.mkString("\n")}")
  }
}
