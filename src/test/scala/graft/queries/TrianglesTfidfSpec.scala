package graft.queries

import graft.SparkSpec

/** Triangle counting and TF-IDF keyword extraction on hand-built
  * fixtures with externally-computed expected results.
  */
class TrianglesTfidfSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("graph_triangles counts a hand-built clique-plus-tail exactly") {
    // Suppliers 1..4 form a K4 (all pairs share 10 parts); supplier 5
    // hangs off node 1 sharing only 1 part — the p99 threshold lands
    // at 10, keeping only the K4: C(4,3)=4 triangles, 3 per node.
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    val k4 = for {
      u <- 1 to 4; v <- 1 to 4 if u < v
      p <- 0 until 10 // parts shared by exactly this pair
    } yield Seq((s"$u$v$p".toLong * 10, u.toLong), (s"$u$v$p".toLong * 10, v.toLong))
    val tail = Seq(Seq((7L, 1L), (7L, 5L)))
    (k4 ++ tail).flatten.toDF("l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.graphTriangles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("text_tfidf ranks a discriminating term above a ubiquitous one") {
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    Seq(
      (1L, "apple apple banana common common common", "en", "s", 6L),
      (2L, "banana banana cherry common common common", "en", "s", 6L),
      (3L, "cherry date date common common common", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.textTfidf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(5)))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // doc1: apple tf=2 df=1 -> score 2*3000000; common tf=3 df=3 -> 3*1000000
    // banana tf=1 df=2 -> 1500000
    assert(doc1.map(_._3).toSeq == Seq("apple", "common", "banana"))
    assert(doc1.map(_._4).toSeq == Seq(6000000L, 3000000L, 1500000L))
    // every doc emits at most 5 rows, ranks contiguous from 1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.size))
    }
  }
}
