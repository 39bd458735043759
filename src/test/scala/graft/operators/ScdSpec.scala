package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD type-2 builder: run collapse, version numbering, interval
  * chaining, null-attribute handling, multi-attribute change detection,
  * a randomized property vs an in-memory reference, and the one-shuffle
  * plan guarantee.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  test("runs collapse, versions number per key, intervals chain, last is current") {
    val log = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"),   // same run
      (1L, 30L, 3L, "b"),                       // change
      (1L, 40L, 4L, "a"),                       // back to a = NEW version
      (2L, 15L, 5L, "x"))
      .toDF("k", "t", "id", "v")
    val got = Scd.buildType2(log, key = Seq("k"), ts = "t",
      ord = Seq("id"), attrs = Seq("v"))
      .select($"k", $"version", $"v", $"valid_from", $"valid_to", $"is_current")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5))).toSet
    assert(got == Set(
      (1L, 1, "a", 10L, 30L, false),
      (1L, 2, "b", 30L, 40L, false),
      (1L, 3, "a", 40L, -1L, true),
      (2L, 1, "x", 15L, -1L, true)))
  }

  test("null attribute values: first-row null is a version, null->value and value->null are changes, null runs collapse") {
    val log = Seq(
      (1L, 10L, 1L, null), (1L, 20L, 2L, null),  // null run collapses
      (1L, 30L, 3L, "a"),
      (1L, 40L, 4L, null))
      .toDF("k", "t", "id", "v")
    val got = Scd.buildType2(log, key = Seq("k"), ts = "t",
      ord = Seq("id"), attrs = Seq("v"))
      .select($"version", $"v", $"valid_from").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(got == Set((1, None, 10L), (2, Some("a"), 30L), (3, None, 40L)))
  }

  test("any tracked attribute change opens a version; untracked columns don't") {
    val log = Seq(
      (1L, 10L, 1L, "a", 1.0, "noise1"),
      (1L, 20L, 2L, "a", 2.0, "noise2"),  // tracked 'w' changed
      (1L, 30L, 3L, "a", 2.0, "noise3"))  // only untracked changed: same run
      .toDF("k", "t", "id", "v", "w", "u")
    val got = Scd.buildType2(log, key = Seq("k"), ts = "t",
      ord = Seq("id"), attrs = Seq("v", "w"))
      .select($"version", $"valid_from").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((1, 10L), (2, 20L)))
  }

  test("property: random change logs equal the in-memory reference") {
    val rnd = new scala.util.Random(31)
    (0 until 15).foreach { trial =>
      val n = 1 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(20).toLong, i.toLong,
          ("abc" (rnd.nextInt(3))).toString)
      }
      val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val runs = sorted.foldLeft(Vector.empty[(Long, String)]) { (acc, r) =>
          if (acc.nonEmpty && acc.last._2 == r._4) acc else acc :+ (r._2 -> r._4)
        }
        runs.zipWithIndex.map { case ((from, v), i) =>
          val to = if (i + 1 < runs.size) Some(runs(i + 1)._1) else None
          (k, i + 1, v, from, to)
        }
      }.toSet
      val got = Scd.buildType2(rows.toDF("k", "t", "id", "v"),
        key = Seq("k"), ts = "t", ord = Seq("id"), attrs = Seq("v"))
        .select($"k", $"version", $"v", $"valid_from", $"valid_to").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
      assert(got == expected, s"trial=$trial")
    }
  }

  test("plan: both window passes ride ONE keyed shuffle") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", unix_millis($"ts").as("ts_ms"), $"event_id", $"event_type")
    val plan = Scd.buildType2(ev, key = Seq("user_id"), ts = "ts_ms",
      ord = Seq("event_id"), attrs = Seq("event_type"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 keyed shuffle, got $exchanges:\n$plan")
  }
}
