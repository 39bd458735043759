package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ts_kalman and ts_lttb certified against independent plain-Scala
  * references (the DuckDB oracle replay runs in the driver gate).
  */
class KalmanLttbSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ts_kalman equals a plain-Scala local-level Kalman filter") {
    val byUser = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).map(_._3)).toMap
    val got = TimeSeriesQueries.tsKalman(spark, dir).collect()
    assert(got.length == byUser.size && got.nonEmpty)
    got.foreach { r =>
      val vs = byUser(r.getLong(0))
      var x = vs.head; var p = 1.0
      vs.tail.foreach { v =>
        val pPred = p + 0.25
        val k = pPred / (pPred + 1.0)
        x = x + k * (v - x)
        p = (1.0 - k) * pPred
      }
      assert(r.getInt(1) == vs.length)
      assert(r.getDouble(2) == x, s"user=${r.getLong(0)} x")
      assert(r.getDouble(3) == p, s"user=${r.getLong(0)} p")
    }
  }

  test("ts_kalman variance converges toward the steady-state Riccati fixpoint") {
    // local-level model steady state: p* = (q + sqrt(q^2 + 4qr))/2 scaled by
    // the update — iterate the recurrence to convergence independently
    var p = 1.0
    (1 to 200).foreach { _ =>
      val pp = p + 0.25; p = (1.0 - pp / (pp + 1.0)) * pp
    }
    val got = TimeSeriesQueries.tsKalman(spark, dir).collect()
    got.filter(_.getInt(1) >= 30).foreach { r =>
      assert(math.abs(r.getDouble(3) - p) < 1e-9,
        s"user=${r.getLong(0)} p_hat=${r.getDouble(3)} vs steady $p")
    }
  }

  test("ts_lttb equals a plain-Scala LTTB replay and keeps endpoints") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_type"), (unix_millis(col("ts")) / 86400000L).cast("long").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val d0 = ev.map(_._2).min; val d1 = ev.map(_._2).max
    val cnt = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val series = ev.map(_._1).distinct.sorted.map { t =>
      t -> (d0 to d1).map(d => (d, cnt.getOrElse((t, d), 0L))).toArray
    }
    val B = 12
    val want = series.map { case (t, pts) =>
      val n = pts.length
      val mid = pts.slice(1, n - 1)
      val buckets = Array.fill(B - 2)(Vector.newBuilder[(Long, Long)])
      mid.zipWithIndex.foreach { case (p, j) =>
        buckets(((j.toLong * (B - 2)) / (n - 2)).toInt) += p
      }
      val bs = buckets.map(_.result())
      var sel = Vector(pts.head)
      for (bi <- 0 until B - 2; if bs(bi).nonEmpty) {
        val nxt = if (bi == B - 3) Vector(pts.last) else bs(bi + 1)
        val (cx, cy) =
          if (nxt.isEmpty) (0.0, 0.0)
          else (nxt.map(_._1).sum.toDouble / nxt.size, nxt.map(_._2).sum.toDouble / nxt.size)
        val prev = sel.last
        val areas = bs(bi).map { p =>
          math.abs((prev._1 - cx) * (p._2 - prev._2).toDouble -
            (prev._1 - p._1).toDouble * (cy - prev._2.toDouble))
        }
        val amax = areas.max
        sel = sel :+ bs(bi)(areas.indexOf(amax))
      }
      t -> (sel :+ pts.last)
    }.toMap
    val got = TimeSeriesQueries.tsLttb(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(e => (e._2, e._3)).toVector).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    want.foreach { case (t, sel) =>
      assert(got(t) == sel.sortBy(_._1), s"type=$t got=${got(t)} want=$sel")
      assert(got(t).size <= B)
      assert(got(t).contains(sel.head) && got(t).contains(sel.last))
    }
  }
}
