package graft.queries

import graft.SparkSpec

/** KS statistic and lag features against hand-computed answers. */
class KsFeatureSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def writeEvents(dir: String,
                          rows: Seq[(Long, Long, String, Long, Double)]): Unit =
    rows.toDF("event_id", "user_id", "event_type", "ts_ms", "value")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_millis($"ts_ms").as("ts"), $"value", lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("stats_ks: hand-computed D on disjoint supports is 1.0; identical samples give 0") {
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    // click values all below view values -> D = 1.0 at the last click value
    writeEvents(dir, Seq(
      (1L, 1L, "click", 0L, 1.0), (2L, 1L, "click", 1L, 2.0),
      (3L, 1L, "view", 2L, 5.0), (4L, 1L, "view", 3L, 6.0),
      (5L, 1L, "error", 4L, 99.0))) // other types are ignored
    val r = Relational.statsKs(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((2L, 2L, 1.0, 2.0)))

    val dir2 = java.nio.file.Files.createTempDirectory("ks2").toString
    writeEvents(dir2, Seq(
      (1L, 1L, "click", 0L, 3.0), (2L, 1L, "view", 1L, 3.0),
      (3L, 1L, "click", 2L, 7.0), (4L, 1L, "view", 3L, 7.0)))
    val r2 = Relational.statsKs(spark, dir2).collect().head
    assert(r2.getDouble(2) == 0.0)
  }

  test("ts_features: explicit lag arithmetic on a known series") {
    val dir = java.nio.file.Files.createTempDirectory("feat").toString
    writeEvents(dir, Seq(
      (1L, 7L, "m", 0L, 10.0), (2L, 7L, "m", 1L, 13.0), (3L, 7L, "m", 2L, 19.0)))
    val got = TimeSeriesQueries.tsFeatures(spark, dir).collect()
      .map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
    assert(got.toSeq == Seq(
      (1L, None, None, None),
      (2L, Some(10.0), Some(3.0), None),
      (3L, Some(13.0), Some(6.0), Some((19.0 + 13.0 + 10.0) / 3.0))))
  }
}
