package graft.queries

import graft.SparkSpec

/** BFS hop distances, ER clustering, and entropy on hand-built
  * fixtures with known answers.
  */
class GraphBfsErSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("graph_bfs: chain distances from the min node; other component unreachable") {
    // co-supply chain 1-2-3-4 (10 shared parts per adjacent pair) and a
    // disconnected pair 5-6; p99 of {10,10,10,10} keeps every edge
    val dir = java.nio.file.Files.createTempDirectory("bfs").toString
    val rows = (for {
      (u, v, tag) <- Seq((1, 2, 0), (2, 3, 1), (3, 4, 2), (5, 6, 3))
      p <- 0 until 10
    } yield Seq((tag * 100L + p, u.toLong), (tag * 100L + p, v.toLong))).flatten
    rows.toDF("l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.graphBfs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("er_cluster: transitive chain collapses to one component labeled by its min id") {
    val dir = java.nio.file.Files.createTempDirectory("ercl").toString
    val block = "Customer#000000000" // shared 17-char prefix (18 chars here, prefix matches)
    Seq(
      (10L, block + "aa"), // ~ dist 1 of ab, dist 2 of bb -> one chain
      (11L, block + "ab"),
      (12L, block + "bb"),
      (20L, "Different#00000000zz"), // block of its own, no partner
      (30L, block + "zz")) // same block as 10-12 but dist 2 from aa? "zz" vs "aa" dist 2 -> joins!
      .toDF("c_custkey", "c_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = Relational.erCluster(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 10,11,12,30 all in the same block; pairwise suffix distances <= 2
    // chain them into a single component labeled 10, size 4
    assert(got.toSet == Set((10L, 10L, 4L), (11L, 10L, 4L), (12L, 10L, 4L), (30L, 10L, 4L)))
  }

  test("stats_entropy: uniform two-type user = ln 2, single-type user = 0") {
    val dir = java.nio.file.Files.createTempDirectory("ent").toString
    Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "b", 1L), (3L, 1L, "a", 2L), (4L, 1L, "b", 3L),
      (5L, 2L, "a", 0L), (6L, 2L, "a", 1L))
      .map { case (e, u, t, ts) => (e, u, t, ts, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts_ms", "value")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_millis($"ts_ms").as("ts"), $"value", lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.statsEntropy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 2L, math.rint(math.log(2) * 1e4) / 1e4), (2L, 1L, 0.0)))
  }
}
