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
}
