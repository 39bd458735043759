package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plain-Scala reference for the backward as-of join: per key, a
  * linear sweep carrying the latest marker at-or-before each event —
  * compared row-for-row against the window-composition operator on
  * the real sf0.001 events.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("joinBackward matches a per-key sweep reference on real events (inclusive ties)") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // markers: event_id % 10 == 0, dedup to max id per (user, ts)
    val markers = ev.filter(_._2 % 10 == 0)
      .groupBy(m => (m._1, m._3)).map { case ((u, us), xs) =>
        (u, us, xs.map(_._2).max)
      }.toSeq
    val expected = ev.groupBy(_._1).iterator.flatMap { case (u, rows) =>
      val mk = markers.filter(_._1 == u).map(m => (m._2, m._3)).sortBy(_._1)
      rows.map { case (_, eid, us) =>
        val hit = mk.takeWhile(_._1 <= us).lastOption
        // lag = difference of the separately-FLOORED ms values (the
        // query computes unix_millis on each side, then subtracts)
        eid -> ((hit.map(_._2),
          hit.map(h => Math.floorDiv(us, 1000L) - Math.floorDiv(h._1, 1000L))))
      }
    }.toMap

    val got = graft.queries.TimeSeriesQueries.tsAsof(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(got.length == expected.size)
    got.foreach { case (eid, mid, lag) =>
      assert((mid, lag) == expected(eid), s"event $eid")
    }
    // as-of discriminates: matched and unmatched rows both occur,
    // self-matches (lag 0) occur, and some lags are positive
    assert(got.exists(_._2.isEmpty) && got.exists(_._2.isDefined))
    assert(got.exists(_._3.contains(0L)) && got.exists(_._3.exists(_ > 0L)))
  }

  test("joinForward mirrors the sweep reference (next marker at-or-after, inclusive)") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val markers = ev.filter(_._2 % 10 == 0)
      .groupBy(m => (m._1, m._3)).map { case ((u, us), xs) =>
        (u, us, xs.map(_._2).max)
      }.toSeq
    val expected = ev.groupBy(_._1).iterator.flatMap { case (u, rows) =>
      val mk = markers.filter(_._1 == u).map(m => (m._2, m._3)).sortBy(_._1)
      rows.map { case (_, eid, us) =>
        val hit = mk.dropWhile(_._1 < us).headOption
        eid -> ((hit.map(_._2),
          hit.map(h => Math.floorDiv(h._1, 1000L) - Math.floorDiv(us, 1000L))))
      }
    }.toMap
    val got = graft.queries.TimeSeriesQueries.tsAsofFwd(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(got.length == expected.size)
    got.foreach { case (eid, mid, wait) =>
      assert((mid, wait) == expected(eid), s"event $eid")
    }
    assert(got.exists(_._2.isEmpty) && got.exists(_._3.contains(0L)) &&
      got.exists(_._3.exists(_ > 0L)))
  }
}
