package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ts_matrix_profile / stats_hurst certified against independent
  * plain-Scala references (the DuckDB oracle runs in the driver gate).
  */
class MatrixProfileHurstSpec extends SparkSpec {

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

  test("ts_matrix_profile equals a brute-force z-normalized scan") {
    val m = 7
    val want = dailySeries().map { case (t, vs) =>
      val ns = vs.length - (m - 1)
      val zs = (0 until ns).map { i =>
        val win = vs.slice(i, i + m)
        val mu = win.sum / 7.0
        val sd = math.sqrt(win.map(x => (x - mu) * (x - mu)).sum / 7.0)
        win.map(x => if (sd == 0.0) 0.0 else (x - mu) / sd)
      }
      def dist(i: Int, j: Int) =
        math.sqrt(zs(i).zip(zs(j)).map { case (a, b) => (a - b) * (a - b) }.sum)
      t -> (0 until ns).map { i =>
        var best = (1e18, -1)
        (0 until ns).foreach { j =>
          if (math.abs(i - j) > m / 2) {
            val d = dist(i, j)
            if (d < best._1) best = (d, j + 1)
          }
        }
        best
      }
    }
    val got = TimeSeriesQueries.tsMatrixProfile(spark, dir).collect()
    assert(got.length == want.values.map(_.size).sum && got.nonEmpty)
    got.foreach { r =>
      val (d, j) = want(r.getString(0))(r.getLong(1).toInt - 1)
      assert(r.getLong(2) == j, s"${r.getString(0)}@${r.getLong(1)} nn_idx")
      assert(math.abs(r.getDouble(3) - d) < 1e-9, s"${r.getString(0)}@${r.getLong(1)} nn_dist")
    }
    // discord sanity: every nearest neighbor respects the exclusion zone
    got.foreach(r => assert(math.abs(r.getLong(1) - r.getLong(2)) > m / 2))
  }

  test("stats_hurst equals a plain-Scala R/S computation") {
    val byUser = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).map(_._3).toArray).toMap
      .filter(_._2.length >= 32)
    def rsAvg(vs: Array[Double], w: Int): Option[Double] = {
      val blocks = (0 until vs.length / w).flatMap { b =>
        val win = vs.slice(b * w, b * w + w)
        val mu = win.sum / w
        val sd = math.sqrt(win.map(x => (x - mu) * (x - mu)).sum / w)
        if (sd <= 0.0) None
        else {
          var cum = 0.0; var mx = -1e18; var mn = 1e18
          win.foreach { x => cum += x - mu; mx = math.max(mx, cum); mn = math.min(mn, cum) }
          Some((mx - mn) / sd)
        }
      }
      if (blocks.isEmpty) None else Some(blocks.sum / blocks.length)
    }
    val got = Inference.statsHurst(spark, dir).collect()
    assert(got.length == byUser.size && got.nonEmpty)
    def close(a: Double, b: Double) =
      math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b))
    got.foreach { r =>
      val vs = byUser(r.getLong(0))
      assert(r.getLong(1) == vs.length)
      Seq((2, 8), (3, 16), (4, 32)).foreach { case (cIdx, w) =>
        (rsAvg(vs, w), if (r.isNullAt(cIdx)) None else Some(r.getDouble(cIdx))) match {
          case (Some(a), Some(b)) => assert(close(b, a), s"user ${r.getLong(0)} w=$w")
          case (None, None) =>
          case other => fail(s"user ${r.getLong(0)} w=$w: $other")
        }
      }
      // R/S grows with scale on these series (long-memory diagnostic sane)
      if (!r.isNullAt(2) && !r.isNullAt(4))
        assert(r.getDouble(4) > r.getDouble(2))
    }
  }
}
