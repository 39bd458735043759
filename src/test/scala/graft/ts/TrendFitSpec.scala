package graft.ts

import org.scalatest.funsuite.AnyFunSuite

class TrendFitSpec extends AnyFunSuite {

  test("T6 fixed-break fit recovers an exact piecewise line") {
    // y = x on [0,10], then y = 20 - x on [10,20]
    val x = (0 to 20).map(_.toDouble).toArray
    val y = x.map(v => if (v <= 10) v else 20 - v)
    val fit = TrendFit.fitFixedBreaks(x, y, Array(0.0, 10.0, 20.0))
    assert(fit.ssr < 1e-16)
    assert(math.abs(fit.segments(0).slope - 1.0) < 1e-9)
    assert(math.abs(fit.segments(1).slope + 1.0) < 1e-9)
  }

  test("T7/T8 model selection finds the elbow on a 2-segment series") {
    val x = (0 to 30).map(_.toDouble).toArray
    val y = x.map(v => if (v <= 15) 2 * v else 30.0)
    val segs = TrendFit.fitSeries(x, y)
    assert(segs.length >= 2)
    // first segment increasing, some later segment ~flat
    assert(segs.head.slope > 1.0)
    assert(segs.exists(s => math.abs(s.slope) < 0.5))
  }

  test("T10 small series connect-the-dots; single point labeled") {
    val segs = TrendFit.fitSeries(Array(0, 1, 2.0), Array(1, 3, 2.0))
    assert(segs.length == 2)
    assert(segs(0).slope == 2.0 && segs(1).slope == -1.0)
    val single = TrendFit.fitSeries(Array(5.0), Array(7.0))
    assert(single.head.description == "single_point")
  }

  test("T9 slope descriptions bucket by threshold") {
    assert(TrendFit.describeSlope(-3) == "decreasing - quickly")
    assert(TrendFit.describeSlope(-1) == "decreasing")
    assert(TrendFit.describeSlope(0.0) == "constant")
    assert(TrendFit.describeSlope(0.3) == "increasing - slowly")
    assert(TrendFit.describeSlope(5) == "increasing - quickly")
  }

  test("T12 recursive p-value segmentation splits a clear breakpoint") {
    val x = (0 to 40).map(_.toDouble).toArray
    val y = x.map(v => if (v <= 20) v else 40 - v)
    val segs = TrendFit.recursiveSegments(x, y)
    assert(segs.length >= 2)
    assert(segs.map(_._2).last == x.length)
    // splits are contiguous
    assert(segs.sliding(2).forall { case Array(a, b) => a._2 == b._1; case _ => true })
  }

  test("fit is deterministic (same input -> same segments)") {
    val rnd = new scala.util.Random(42)
    val x = (0 to 50).map(_.toDouble).toArray
    val y = x.map(v => v * 0.5 + rnd.nextGaussian())
    val a = TrendFit.fitSeries(x, y).toSeq
    val b = TrendFit.fitSeries(x, y).toSeq
    assert(a == b)
  }

  test("T7 differential evolution finds the knee, reproducibly") {
    val x = (0 to 20).map(_.toDouble).toArray
    val y = x.map(v => if (v <= 5) 4 * v else 20 - (v - 5))
    val fit = TrendFit.searchBreaksDE(x, y, 2)
    assert(fit.breaks.length == 3)
    assert(math.abs(fit.breaks(1) - 5.0) < 0.2) // DE converges to the true knee
    assert(fit.ssr < 1.0)
    // fixed seed -> bit-identical reruns
    val again = TrendFit.searchBreaksDE(x, y, 2)
    assert(fit.breaks.sameElements(again.breaks) && fit.ssr == again.ssr)
    // and it matches (or beats) the deterministic grid at equal segments
    val grid = TrendFit.searchBreaks(x, y, 2)
    assert(fit.ssr <= grid.ssr + 1e-9)
  }

  test("degenerate series: all-equal x with n > 6 fits flat instead of crashing") {
    // ADVICE r2: quantile .distinct can leave < nInterior candidates;
    // the nInterior==2 pair loop then never runs and searchBreaks must
    // fall back, not return null (which NPE'd fitSeries at cost()).
    val x = Array.fill(10)(3.0)
    val y = (1 to 10).map(_.toDouble).toArray
    val segs = TrendFit.fitSeries(x, y)
    assert(segs.length == 1)
    assert(segs.head.slope == 0.0)
    assert(math.abs(segs.head.intercept - 5.5) < 1e-9) // mean of y
    // two distinct x values: still fewer candidates than 2 interior
    // breaks -> straight-line fallback, no crash
    val x2 = Array.fill(5)(0.0) ++ Array.fill(5)(1.0)
    val segs2 = TrendFit.fitSeries(x2, (1 to 10).map(_.toDouble).toArray)
    assert(segs2.nonEmpty)
  }

  // Golden fixture for the full fitSeries pipeline (T6+T7+T8+T9+T11),
  // expectations derived by hand from the model definition:
  //   y = 4x on [0,5] (up to 20), y = 20-(x-5) on [5,20] (down to 5),
  //   x = 0..20 integers (21 points > 6 -> the PWL path, not T10).
  // Model selection starts at 3 segments (linear_fit.py:149-175) and the
  // true shape has 2, so one interior break is redundant: any pair
  // containing 5.0 fits exactly and SSR ties at ~1e-27 machine noise —
  // WHICH redundant pair wins is therefore not hand-derivable, but the
  // model-implied invariants are: a break sits at 5.0, every segment
  // left of it has slope 4 through the origin, every segment right of
  // it lies on y = 25 - x, 4 segments cost >= 0.08 > ~0.06 so selection
  // stops at 3. Scaled slopes (xRange/yRange = 1): 4 -> "increasing -
  // quickly" (> 2), -1 -> "decreasing" ([-2, -0.5)).
  test("golden: fitSeries recovers hand-derived segments on a 2-piece series") {
    val x = (0 to 20).map(_.toDouble).toArray
    val y = x.map(v => if (v <= 5) 4 * v else 20 - (v - 5))
    val segs = TrendFit.fitSeries(x, y)
    assert(segs.length == 3)
    assert(segs.head.startX == 0.0 && segs.last.endX == 20.0)
    assert(segs.exists(s => math.abs(s.endX - 5.0) < 1e-9 || math.abs(s.startX - 5.0) < 1e-9))
    segs.foreach { s =>
      if (s.endX <= 5.0 + 1e-9) {
        assert(math.abs(s.slope - 4.0) < 1e-6)
        assert(math.abs(s.intercept) < 1e-6)
        assert(s.description == "increasing - quickly")
      } else {
        assert(math.abs(s.slope + 1.0) < 1e-6)
        assert(math.abs(s.intercept - 25.0) < 1e-6)
        assert(s.description == "decreasing")
      }
    }
    // T11 interval tiling: segments cover [min x, max x] contiguously
    assert(segs.sliding(2).forall {
      case Array(a, b) => a.endX == b.startX
      case _ => true
    })
  }
}

/** End-to-end golden check for the ts_trend QUERY (the one no_oracle
  * entry): the same hand-derived fixture flows through the real query
  * path (parquet scan -> groupByKey.mapGroups -> Breeze fit) and must
  * produce the exact segments above for every series.
  */
class TrendQueryGoldenSpec extends graft.SparkSpec {
  test("golden e2e: tsTrend query reproduces hand-derived segments from parquet") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dayMs = 86400000L
    // two identical series under different user ids: exercises the
    // distributed per-series grouping, not just one group
    val rows = for {
      uid <- Seq(7L, 11L)
      i <- 0 to 20
    } yield (uid, uid * 1000 + i, "view",
      new java.sql.Timestamp(i * dayMs),
      if (i <= 5) 4.0 * i else 20.0 - (i - 5))
    val dir = java.nio.file.Files.createTempDirectory("trend_golden").toString
    rows.toDF("user_id", "event_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.TimeSeriesQueries.tsTrend(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))
    assert(out.length == 6) // 3 segments x 2 series
    for (uid <- Seq(7L, 11L)) {
      val segs = out.filter(_._1 == uid).sortBy(_._2)
      assert(segs.length == 3)
      assert(segs.head._3 == 0.0 && segs.last._4 == 20.0)
      // same invariants as the unit golden: break at 5, y=4x left of it,
      // y=25-x right of it (which redundant 3rd break wins is SSR-tie
      // noise, not hand-derivable — see TrendFitSpec)
      segs.foreach { s =>
        if (s._4 <= 5.0 + 1e-9) {
          assert(math.abs(s._5 - 4.0) < 1e-6 && math.abs(s._6) < 1e-6)
          assert(s._7 == "increasing - quickly")
        } else {
          assert(math.abs(s._5 + 1.0) < 1e-6 && math.abs(s._6 - 25.0) < 1e-6)
          assert(s._7 == "decreasing")
        }
      }
      // contiguous tiling
      assert(segs.sliding(2).forall {
        case Array(a, b) => a._4 == b._3
        case _ => true
      })
    }
  }
}
