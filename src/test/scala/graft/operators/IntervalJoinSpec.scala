package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketized range join against the naive theta join it replaces:
  * identical pairs on real events (any bucket width), inclusive-bound
  * and boundary edge cases, and the plan guarantee — an equi-join
  * shape, never BroadcastNestedLoop/cartesian.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def evs = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"))

  private def marks = evs.filter($"event_id" % 10 === 0)
    .groupBy($"user_id", $"ts_ms")
    .agg(max($"event_id").as("m_id"))
    .select($"user_id", $"ts_ms".as("m_start"),
      ($"ts_ms" + 21600000L).as("m_end"), $"m_id")

  test("bucketized join equals the naive theta join on real events, across bucket widths") {
    val naive = evs.join(marks, Seq("user_id"))
      .filter($"ts_ms" >= $"m_start" && $"ts_ms" <= $"m_end")
      .select($"event_id", $"m_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    // widths spanning under- and over-sized buckets vs the 6h interval
    Seq(3600000L, 21600000L, 86400000L).foreach { w =>
      val got = IntervalJoin.joinPointInInterval(evs, marks,
        key = Seq("user_id"), ts = "ts_ms", start = "m_start", end = "m_end",
        bucketMs = w)
        .select($"event_id", $"m_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketMs=$w: ${got.size} vs ${naive.size} pairs")
    }
  }

  test("inclusive bounds, bucket-boundary points, empty and multi-bucket intervals") {
    val pts = Seq((1L, 0L, 100L), (1L, 10L, 101L), (1L, 25L, 102L),
      (1L, 99L, 103L), (2L, 10L, 104L))
      .toDF("k", "t", "pid")
    val ivs = Seq(
      (1L, 0L, 10L, 201L),   // inclusive both ends: catches t=0 AND t=10
      (1L, 11L, 24L, 202L),  // catches nothing
      (1L, 20L, 99L, 203L),  // spans many 10-wide buckets: t=25, t=99
      (1L, 50L, 40L, 204L),  // empty (end < start): no rows, no error
      (2L, 10L, 10L, 205L))  // degenerate single-point: t=10 on key 2
      .toDF("k", "s", "e", "iid")
    val got = IntervalJoin.joinPointInInterval(pts, ivs,
      key = Seq("k"), ts = "t", start = "s", end = "e", bucketMs = 10L)
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 201L), (101L, 201L), (102L, 203L),
      (103L, 203L), (104L, 205L)))
  }

  test("property: random points/intervals/bucket widths always equal the in-memory reference") {
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { trial =>
      val nP = 1 + rnd.nextInt(40)
      val nI = 1 + rnd.nextInt(25)
      val pts = (0 until nP).map(i =>
        (rnd.nextInt(3).toLong, rnd.nextInt(200).toLong, 1000L + i))
      val ivs = (0 until nI).map { i =>
        val s = rnd.nextInt(220) - 10
        // mixes empty (negative-span), point, short and long intervals
        (rnd.nextInt(3).toLong, s.toLong, (s + rnd.nextInt(60) - 5).toLong, 2000L + i)
      }
      val expected = (for {
        (pk, t, pid) <- pts
        (ik, s, e, iid) <- ivs if pk == ik && s <= t && t <= e
      } yield (pid, iid)).toSet
      val bucket = 1L + rnd.nextInt(100)
      val got = IntervalJoin.joinPointInInterval(
        pts.toDF("k", "t", "pid"), ivs.toDF("k", "s", "e", "iid"),
        key = Seq("k"), ts = "t", start = "s", end = "e", bucketMs = bucket)
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"trial=$trial bucketMs=$bucket")
      // streaming bounded mode agrees too (same trial data)
      val taggedRows = pts.map { case (k, t, pid) =>
        (k, t, t, false, pid, new java.sql.Timestamp(t))
      } ++ ivs.map { case (k, s, e, iid) =>
        (k, s, e, true, iid, new java.sql.Timestamp(s))
      }
      val tagged = taggedRows
        .toDF("key", "startMs", "endMs", "isInterval", "rid", "ts")
        .as[graft.streaming.StreamingIntervalJoin.In]
      val gotStream = graft.streaming.StreamingIntervalJoin
        .boundedOf(spark, tagged)
        .collect().map(o => (o.pointId, o.intervalId)).toSet
      assert(gotStream == expected, s"stream trial=$trial")
    }
  }

  test("overlap join: touching, nested, disjoint, empty and cross-key intervals") {
    val l = Seq(
      (1L, 0L, 10L, 100L),   // overlaps 201 (touching at 10), 202 (nested)
      (1L, 40L, 50L, 101L),  // disjoint from everything on key 1
      (1L, 60L, 55L, 102L),  // empty (end < start): never emitted
      (2L, 0L, 100L, 103L))  // key 2: overlaps 204 only
      .toDF("k", "ls", "le", "lid")
    val r = Seq(
      (1L, 10L, 20L, 201L),  // touches 100 at exactly t=10 (closed bounds)
      (1L, 2L, 8L, 202L),    // nested inside 100
      (1L, 11L, 39L, 203L),  // between 100 and 101: no overlap
      (2L, 99L, 300L, 204L), // overlaps 103 at [99,100]
      (3L, 0L, 10L, 205L))   // key 3: no left partner
      .toDF("k", "rs", "re", "rid")
    val got = IntervalJoin.joinIntervalOverlap(l, r, key = Seq("k"),
      lstart = "ls", lend = "le", rstart = "rs", rend = "re", bucketMs = 7L)
      .select($"lid", $"rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((100L, 201L), (100L, 202L), (103L, 204L)))
  }

  test("property: random interval pairs equal the in-memory reference, each pair EXACTLY once") {
    val rnd = new scala.util.Random(23)
    (0 until 20).foreach { trial =>
      val nL = 1 + rnd.nextInt(30)
      val nR = 1 + rnd.nextInt(30)
      val ls = (0 until nL).map { i =>
        val s = rnd.nextInt(220) - 10
        (rnd.nextInt(3).toLong, s.toLong, (s + rnd.nextInt(60) - 5).toLong, 1000L + i)
      }
      val rs = (0 until nR).map { i =>
        val s = rnd.nextInt(220) - 10
        (rnd.nextInt(3).toLong, s.toLong, (s + rnd.nextInt(60) - 5).toLong, 2000L + i)
      }
      val expected = (for {
        (lk, a, b, lid) <- ls if a <= b
        (rk, c, d, rid) <- rs if rk == lk && c <= d && a <= d && c <= b
      } yield (lid, rid)).toSet
      val bucket = 1L + rnd.nextInt(100)
      val rows = IntervalJoin.joinIntervalOverlap(
        ls.toDF("k", "ls", "le", "lid"), rs.toDF("k", "rs", "re", "rid"),
        key = Seq("k"), lstart = "ls", lend = "le", rstart = "rs", rend = "re",
        bucketMs = bucket)
        .select($"lid", $"rid").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      // canonical-bucket filter ⇒ no per-shared-bucket duplicates
      assert(rows.length == rows.toSet.size, s"trial=$trial emitted duplicates")
      assert(rows.toSet == expected, s"trial=$trial bucketMs=$bucket")
    }
  }

  test("plan is an equi-join on (key, bucket): no nested loop, no cartesian") {
    val df = graft.queries.TimeSeriesQueries.tsRangeJoin(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must bucketize to an equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi-join on (key, bucket):\n$p")
    val po = graft.queries.TimeSeriesQueries
      .tsIntervalOverlap(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!po.contains("BroadcastNestedLoopJoin") && !po.contains("CartesianProduct"),
      s"overlap join must bucketize to an equi-join:\n$po")
  }
}
