package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ts_sax / ts_changepoints certified against independent plain-Scala
  * references (the DuckDB oracle runs in the driver gate): brute SAX
  * symbolization and a brute-force optimal-partitioning DP including
  * the backward changepoint walk the emitted table enables.
  */
class SaxChangepointSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dailySeries(): Map[String, Array[Double]] = {
    val rows = graft.Tables(spark, dir, "events")
      .select(col("event_type"),
        (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .groupBy(col("event_type"), col("day")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).map { case (t, g) =>
      val byDay = g.map(e => e._2 -> e._3).toMap
      val (d0, d1) = (byDay.keys.min, byDay.keys.max)
      t -> (d0 to d1).map(d => byDay.getOrElse(d, 0L).toDouble).toArray
    }
  }

  test("ts_sax equals a plain-Scala PAA + breakpoint quantization") {
    val want = dailySeries().map { case (t, vs) =>
      val n = vs.length
      val mu = vs.sum / n
      val sd = math.sqrt(vs.map(x => (x - mu) * (x - mu)).sum / n)
      val word = (0 until n / 5).map { k =>
        val paa = vs.slice(k * 5, k * 5 + 5)
          .map(x => if (sd == 0.0) 0.0 else (x - mu) / sd).sum / 5.0
        if (paa < -0.6745) 'a' else if (paa < 0.0) 'b'
        else if (paa < 0.6745) 'c' else 'd'
      }.mkString
      t -> (n.toLong, word)
    }
    val got = TimeSeriesQueries.tsSax(spark, dir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, w) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getString(2) == w,
        s"${r.getString(0)}: got ${r.getString(2)} want $w")
    }
    // the alphabet is actually exercised on the fixture
    assert(got.map(_.getString(2)).mkString.distinct.length >= 2)
  }

  test("ts_changepoints DP table equals brute force and backtracks to optimal segmentations") {
    val want = dailySeries().map { case (t, vs) =>
      val n = vs.length
      val px = vs.scanLeft(0.0)(_ + _)
      val px2 = vs.map(x => x * x).scanLeft(0.0)(_ + _)
      def sse(s: Int, tt: Int) =
        (px2(tt) - px2(s)) - (px(tt) - px(s)) * (px(tt) - px(s)) / (tt - s).toDouble
      val beta = sse(0, n) / 8.0
      val f = Array.fill(n + 1)(0.0)
      val bp = Array.fill(n + 1)(0)
      (1 to n).foreach { tt =>
        var best = 1e18; var bs = -1
        (0 until tt).foreach { s =>
          val v = f(s) + sse(s, tt) + beta
          if (v < best) { best = v; bs = s }
        }
        f(tt) = best; bp(tt) = bs
      }
      t -> (f, bp, beta)
    }
    val got = TimeSeriesQueries.tsChangepoints(spark, dir).collect()
      .groupBy(_.getString(0))
    assert(got.keySet == want.keySet && got.nonEmpty)
    def close(a: Double, b: Double) =
      math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b))
    got.foreach { case (t, rows) =>
      val (f, bp, _) = want(t)
      assert(rows.length == f.length - 1)
      rows.foreach { r =>
        val tt = r.getLong(1).toInt
        assert(close(r.getDouble(2), f(tt)), s"$t F($tt)")
        assert(r.getLong(3) == bp(tt), s"$t bp($tt)")
      }
      // the emitted table backtracks to a valid segmentation whose cost
      // matches F(n): walk bp from n, summing segment SSEs + penalties
      val n = f.length - 1
      val vs = dailySeries()(t)
      val px = vs.scanLeft(0.0)(_ + _)
      val px2 = vs.map(x => x * x).scanLeft(0.0)(_ + _)
      def sse(s: Int, tt: Int) =
        (px2(tt) - px2(s)) - (px(tt) - px(s)) * (px(tt) - px(s)) / (tt - s).toDouble
      val beta = want(t)._3
      var cur = n; var cost = 0.0; var guard = 0
      while (cur > 0 && guard < n + 1) {
        val s = bp(cur); cost += sse(s, cur) + beta; cur = s; guard += 1
      }
      assert(cur == 0 && close(cost, f(n)), s"$t backtrack cost")
    }
  }
}
