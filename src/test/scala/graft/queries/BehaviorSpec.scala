package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Behavior]] certified against independent plain-Scala references
  * (the DuckDB oracle runs in the driver gate): gaps-and-islands
  * sessionization and the sliding-window ordered funnel.
  */
class BehaviorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def eventRows(): Array[(Long, Long, String, Long)] =
    graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("sessionize equals a plain-Scala gap split") {
    val byUser = eventRows().groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).map(_._4)).toMap
    val want = byUser.map { case (u, ts) =>
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head > 1800000L) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      u -> (sessions.length.toLong,
        ts.length.toLong,
        sessions.map(s => s.last - s.head).sum,
        sessions.map(_.length.toLong).max)
    }
    val got = Behavior.sessionize(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val w = want(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == w,
        s"user ${r.getLong(0)}")
    }
  }

  test("window_funnel equals a brute-force triple scan") {
    val H = 14400000L
    val byUser = eventRows().groupBy(_._1)
    val want = byUser.map { case (u, evs) =>
      def ts(t: String) = evs.filter(_._3 == t).map(_._4)
      val (vs, cs, ps) = (ts("view"), ts("click"), ts("purchase"))
      val l3 = vs.exists(v => cs.exists(c => c > v && c <= v + H &&
        ps.exists(p => p > c && p <= v + H)))
      val l2 = vs.exists(v => cs.exists(c => c > v && c <= v + H))
      u -> (if (l3) 3L else if (l2) 2L else if (vs.nonEmpty) 1L else 0L)
    }
    val got = Behavior.windowFunnel(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach(r => assert(r.getLong(1) == want(r.getLong(0)),
      s"user ${r.getLong(0)}: got ${r.getLong(1)} want ${want(r.getLong(0))}"))
    // non-trivial fixture: the window must BIND (some user stuck at 1)
    // while others clear it (level 2); level 3 appears at sf0.01 where
    // the driver's oracle gate runs
    assert(got.exists(_.getLong(1) == 2L) && got.exists(_.getLong(1) == 1L))
  }
}
