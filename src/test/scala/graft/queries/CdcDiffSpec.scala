package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** snapshot_diff closure: applying the emitted I/U/D feed to the old
  * snapshot reproduces the new snapshot exactly.
  */
class CdcDiffSpec extends SparkSpec {
  import spark.implicits._

  test("apply(diff(old, new), old) == new") {
    val dir = "/root/testdata/sf0.001"
    val midMs = 1705363200000L
    val log = graft.Tables(spark, dir, "events")
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id",
        when($"event_type" === "error", lit("D")).otherwise(lit("U")).as("op"),
        $"value")
    def snapshot(l: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts_ms".desc, $"event_id".desc)
      l.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1 && $"op" =!= "D")
        .select($"user_id", $"ts_ms", $"event_id", $"value")
    }
    val oldSnap = snapshot(log.filter($"ts_ms" < midMs)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val newSnap = snapshot(log).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val diff = TimeSeriesQueries.snapshotDiff(spark, dir).collect()
    assert(diff.nonEmpty && diff.exists(_.getString(0) == "I") &&
      diff.exists(_.getString(0) == "U"))
    // apply the feed to the old snapshot
    val applied = diff.foldLeft(oldSnap) { (acc, r) =>
      val (op, uid) = (r.getString(0), r.getLong(1))
      op match {
        case "D" => acc - uid
        case _   => acc + (uid -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      }
    }
    assert(applied == newSnap)
  }
}
