package graft.ts

import breeze.linalg.{DenseMatrix, DenseVector}

/** Piecewise-linear trend fitting (SURVEY §2.9 T6–T12; reference
  * `utilities/timeseries/trend/pwlf/pwlf.py` + `linear_fit.py`).
  *
  * Deterministic variant: the reference uses stochastic differential
  * evolution for break search (pwlf.py:268-320); we use a quantile-grid
  * search with local refinement — same model family, reproducible
  * results (SURVEY §7 "hard parts").
  *
  * Runs per-series inside `groupByKey.mapGroups` — series are small
  * (the reference processes them in a Python driver loop), so the
  * distributed axis is the number of series, not points per series.
  */
object TrendFit {

  final case class Segment(
      startX: Double, endX: Double,
      slope: Double, intercept: Double,
      description: String)

  final case class Fit(breaks: Array[Double], ssr: Double, segments: Array[Segment])

  /** T6 continuous PWL least squares with fixed interior breaks
    * (pwlf.py:53-128): basis β0 + β1(x−b0) + Σ βk·max(0, x−bk).
    */
  def fitFixedBreaks(x: Array[Double], y: Array[Double], breaks: Array[Double]): Fit = {
    val n = x.length
    val bAll = breaks
    val k = bAll.length // includes both endpoints
    val a = DenseMatrix.zeros[Double](n, k)
    var i = 0
    while (i < n) {
      a(i, 0) = 1.0
      a(i, 1) = x(i) - bAll(0)
      var j = 2
      while (j < k) {
        a(i, j) = math.max(0.0, x(i) - bAll(j - 1))
        j += 1
      }
      i += 1
    }
    val yv = DenseVector(y)
    val beta = a \ yv // QR least squares (pinv's SVD is ~4x slower here)
    val resid = a * beta - yv
    val ssr = resid.dot(resid)
    Fit(bAll, ssr, segmentsFromBeta(bAll, beta.toArray, x, y))
  }

  private def segmentsFromBeta(breaks: Array[Double], beta: Array[Double],
                               x: Array[Double], y: Array[Double]): Array[Segment] = {
    val yRange = math.max(1e-12, y.max - y.min)
    val xRange = math.max(1e-12, x.max - x.min)
    (0 until breaks.length - 1).map { s =>
      // cumulative slope up to segment s
      var slope = beta(1)
      var j = 2
      while (j <= s + 1 && j < beta.length) { slope += beta(j); j += 1 }
      val x0 = breaks(s)
      val y0 = predictAt(breaks, beta, x0)
      val intercept = y0 - slope * x0
      val scaled = slope * xRange / yRange // T9 y_axis_scale semantics
      Segment(breaks(s), breaks(s + 1), slope, intercept, describeSlope(scaled))
    }.toArray
  }

  def predictAt(breaks: Array[Double], beta: Array[Double], xv: Double): Double = {
    var yv = beta(0) + beta(1) * (xv - breaks(0))
    var j = 2
    while (j < beta.length) {
      yv += beta(j) * math.max(0.0, xv - breaks(j - 1))
      j += 1
    }
    yv
  }

  /** T9 thresholds → 7 labels (linear_fit.py:9-17). */
  def describeSlope(scaled: Double): String = {
    val t = TimeSeriesOps.SlopeThresholds
    val l = TimeSeriesOps.SlopeLabels
    val idx = t.indexWhere(scaled < _)
    if (idx < 0) l.last else l(idx)
  }

  /** T7 deterministic break search: candidate interior breaks from the
    * sorted-x quantile grid, exhaustive over the (small) grid for 1–2
    * interior breaks, greedy beyond (the reference's stochastic DE is
    * replaced by this reproducible variant).
    */
  def searchBreaks(x: Array[Double], y: Array[Double], nSegments: Int,
                   gridSize: Int = 8): Fit = {
    val lo = x.min; val hi = x.max
    if (nSegments <= 1) return fitFixedBreaks(x, y, Array(lo, hi))
    // quantiles of the SORTED x (linearly interpolated), not a uniform
    // span grid: clumped data (e.g. 90 points in [0,1] plus one at 100)
    // needs candidate breaks where the points actually are — a uniform
    // grid would place every candidate in the empty region. For evenly
    // spaced x the two coincide.
    val xs = x.sorted
    val candidates = (1 until gridSize).map { i =>
      val pos = (xs.length - 1).toDouble * i / gridSize
      val lo2 = xs(pos.toInt)
      val hi2 = xs(math.min(xs.length - 1, pos.toInt + 1))
      lo2 + (hi2 - lo2) * (pos - pos.toInt)
    }.distinct.toArray
    val nInterior = nSegments - 1
    var best: Fit = null
    def eval(interior: Array[Double]): Unit = {
      val fit = fitFixedBreaks(x, y, (lo +: interior.sorted.toSeq :+ hi).toArray)
      if (best == null || fit.ssr < best.ssr) best = fit
    }
    if (nInterior == 1) candidates.foreach(c => eval(Array(c)))
    else if (nInterior == 2)
      for (i <- candidates.indices; j <- i + 1 until candidates.length)
        eval(Array(candidates(i), candidates(j)))
    else {
      // greedy: start from even spacing, refine one break at a time
      var interior = (1 to nInterior)
        .map(i => lo + (hi - lo) * i / nSegments.toDouble).toArray
      eval(interior)
      for (_ <- 0 until 2; b <- 0 until nInterior; c <- candidates) {
        val trial = interior.clone; trial(b) = c
        if (trial.distinct.length == nInterior) {
          val fit = fitFixedBreaks(x, y, (lo +: trial.sorted.toSeq :+ hi).toArray)
          if (fit.ssr < best.ssr) { best = fit; interior = trial }
        }
      }
    }
    // Degenerate series (fewer distinct x quantiles than interior breaks —
    // e.g. >6 points all at one timestamp) leave the candidate loops empty;
    // fall back to a single straight-line fit instead of returning null.
    if (best != null) best
    else if (hi - lo < 1e-12) {
      // all x coincide: the PWL basis is rank-deficient — emit a flat segment
      val my = y.sum / y.length
      val resid = y.map(v => (v - my) * (v - my)).sum
      Fit(Array(lo, hi), resid, Array(Segment(lo, hi, 0.0, my, describeSlope(0.0))))
    } else fitFixedBreaks(x, y, Array(lo, hi))
  }

  /** T7 stochastic break search — the reference's actual optimizer
    * family (pwlf.py:268-320 runs scipy differential_evolution over the
    * interior break positions). This is DE/rand/1/bin with a FIXED seed:
    * same algorithm, reproducible runs (the deterministic grid variant
    * [[searchBreaks]] remains the default; this closes the documented
    * T7 deviation for callers wanting optimizer parity).
    */
  def searchBreaksDE(x: Array[Double], y: Array[Double], nSegments: Int,
                     popSize: Int = 15, generations: Int = 40,
                     f: Double = 0.8, cr: Double = 0.9, seed: Long = 42L): Fit = {
    val lo = x.min; val hi = x.max
    val nInterior = nSegments - 1
    if (nInterior <= 0) return fitFixedBreaks(x, y, Array(lo, hi))
    val rnd = new scala.util.Random(seed)
    val minGap = (hi - lo) * 1e-6
    def fitness(v: Array[Double]): Double = {
      val all = (lo +: v.sorted.toSeq :+ hi).toArray
      // coincident breaks make the PWL basis rank-deficient — reject
      if (all.sliding(2).exists { case Array(a, b) => b - a < minGap }) Double.MaxValue
      else fitFixedBreaks(x, y, all).ssr
    }
    val pop = Array.fill(popSize)(Array.fill(nInterior)(lo + (hi - lo) * rnd.nextDouble()))
    val fitVals = pop.map(fitness)
    for (_ <- 0 until generations; i <- 0 until popSize) {
      def pick(): Int = {
        var j = rnd.nextInt(popSize); while (j == i) j = rnd.nextInt(popSize); j
      }
      val (a, b, c) = (pop(pick()), pop(pick()), pop(pick()))
      val jRand = rnd.nextInt(nInterior)
      val trial = Array.tabulate(nInterior) { j =>
        if (j == jRand || rnd.nextDouble() < cr)
          math.min(hi, math.max(lo, a(j) + f * (b(j) - c(j))))
        else pop(i)(j)
      }
      val tf = fitness(trial)
      if (tf <= fitVals(i)) { pop(i) = trial; fitVals(i) = tf }
    }
    val best = fitVals.indices.minBy(fitVals)
    fitFixedBreaks(x, y, (lo +: pop(best).sorted.toSeq :+ hi).toArray)
  }

  /** T7 `fitfast` parity (pwlf.py:321-413): the reference's SECOND
    * optimizer — Latin-hypercube seeding + bounded local minimization
    * (scipy `minimize` L-BFGS-B with numerical gradients) from each
    * seed, best local optimum wins. Here: a seeded deterministic LHS
    * (one stratum per seed per dimension, independently permuted) and
    * Breeze [[breeze.optimize.LBFGSB]] over an
    * [[breeze.optimize.ApproximateGradientFunction]] — the same
    * finite-difference scheme scipy defaults to. Near-coincident
    * breaks (rank-deficient PWL basis) get a large finite penalty so
    * the line search backs off the cliff. Deterministic for a given
    * seed, like [[searchBreaksDE]].
    */
  def searchBreaksFast(x: Array[Double], y: Array[Double], nSegments: Int,
                       nSeeds: Int = 10, seed: Long = 42L): Fit = {
    val lo = x.min; val hi = x.max
    val nInterior = nSegments - 1
    if (nInterior <= 0 || hi - lo < 1e-12)
      return searchBreaks(x, y, nSegments) // shares the degenerate fallbacks
    val rnd = new scala.util.Random(seed)
    val minGap = (hi - lo) * 1e-6
    def fitness(v: Array[Double]): Double = {
      val all = (lo +: v.sorted.toSeq :+ hi).toArray
      if (all.sliding(2).exists { case Array(a, b) => b - a < minGap }) 1e100
      else fitFixedBreaks(x, y, all).ssr
    }
    // LHS: each seed takes one stratum per dimension; strata are
    // independently permuted across dimensions (the LHS property), all
    // from the fixed-seed generator
    val perms = Array.fill(nInterior)(rnd.shuffle((0 until nSeeds).toVector))
    val seeds = Array.tabulate(nSeeds) { s =>
      Array.tabulate(nInterior) { d =>
        lo + (hi - lo) * (perms(d)(s) + rnd.nextDouble()) / nSeeds
      }
    }
    val margin = (hi - lo) * 1e-3
    val lower = DenseVector.fill(nInterior)(lo + margin)
    val upper = DenseVector.fill(nInterior)(hi - margin)
    val solver = new breeze.optimize.LBFGSB(lower, upper, maxIter = 60, m = 5)
    val approx = new breeze.optimize.ApproximateGradientFunction[Int, DenseVector[Double]](
      v => fitness(v.toArray), (hi - lo) * 1e-7)
    var bestV: Array[Double] = null
    var bestF = Double.MaxValue
    seeds.foreach { s0 =>
      val clamped = DenseVector(s0.map(v => math.min(hi - margin, math.max(lo + margin, v))))
      val res =
        try solver.minimize(approx, clamped)
        catch { case _: Exception => clamped } // line-search failure: keep the seed
      val f = fitness(res.toArray)
      if (f < bestF) { bestF = f; bestV = res.toArray }
    }
    if (bestV == null) searchBreaks(x, y, nSegments)
    else fitFixedBreaks(x, y, (lo +: bestV.sorted.toSeq :+ hi).toArray)
  }

  /** T8 model selection (linear_fit.py:13,149-175): grow segments from 3
    * while cost = SSR/n/range² + 0.02·segments decreases; cap at n/3.
    * T10: ≤6 points → connect-the-dots; 1 point → single_point.
    */
  def fitSeries(x: Array[Double], y: Array[Double]): Array[Segment] = {
    val n = x.length
    if (n == 0) return Array.empty
    if (n == 1)
      return Array(Segment(x(0), x(0), 0.0, y(0), "single_point"))
    if (n <= 6) return connectDots(x, y)
    val yRange = math.max(1e-12, y.max - y.min)
    def cost(f: Fit, segs: Int): Double = f.ssr / n / (yRange * yRange) + 0.02 * segs
    // Reference caps at n/3 (linear_fit.py:175); we additionally cap at 8
    // segments — beyond that the 0.02/seg penalty never pays off on real
    // series and the search cost grows quadratically.
    val maxSeg = math.min(8, math.max(3, n / 3))
    var bestFit = searchBreaks(x, y, 3)
    var bestCost = cost(bestFit, 3)
    var segs = 4
    var improved = true
    while (improved && segs <= maxSeg) {
      val f = searchBreaks(x, y, segs)
      val c = cost(f, segs)
      if (c < bestCost) { bestFit = f; bestCost = c; segs += 1 }
      else improved = false
    }
    bestFit.segments
  }

  /** T10 small-series fit: connect consecutive points. */
  def connectDots(x: Array[Double], y: Array[Double]): Array[Segment] = {
    val yRange = math.max(1e-12, y.max - y.min)
    val xRange = math.max(1e-12, x.max - x.min)
    (0 until x.length - 1).map { i =>
      val slope =
        if (x(i + 1) == x(i)) 0.0 else (y(i + 1) - y(i)) / (x(i + 1) - x(i))
      Segment(x(i), x(i + 1), slope, y(i) - slope * x(i),
        describeSlope(slope * xRange / yRange))
    }.toArray
  }

  /** T12 recursive p-value segmentation (recursive_p_value.py:33-149):
    * split at the point minimizing pα+pβ of OLS t-tests vs the parent
    * line; stop when n ≤ 5 or best p-sum > 0.1.
    */
  def recursiveSegments(x: Array[Double], y: Array[Double],
                        pStop: Double = 0.1): Array[(Int, Int)] = {
    def ols(xs: Array[Double], ys: Array[Double]): (Double, Double, Double) = {
      val n = xs.length
      val mx = xs.sum / n; val my = ys.sum / n
      val sxx = xs.map(v => (v - mx) * (v - mx)).sum
      if (sxx == 0) return (0.0, my, 1.0)
      val sxy = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val slope = sxy / sxx
      val icept = my - slope * mx
      val ssr = xs.zip(ys).map { case (a, b) =>
        val e = b - (slope * a + icept); e * e
      }.sum
      val se = math.sqrt(ssr / math.max(1, n - 2) / sxx)
      val p =
        if (n <= 2) 1.0
        else if (se == 0) { if (slope == 0) 1.0 else 0.0 } // perfect fit
        else 2.0 * (1.0 - new org.apache.commons.math3.distribution.TDistribution(n - 2)
          .cumulativeProbability(math.abs(slope / se)))
      (slope, icept, p)
    }
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    def split(lo: Int, hi: Int): Unit = {
      val n = hi - lo
      if (n <= 5) { out += ((lo, hi)); return }
      var bestP = Double.MaxValue; var bestK = -1
      var k = lo + 3
      while (k <= hi - 3) {
        val (_, _, p1) = ols(x.slice(lo, k), y.slice(lo, k))
        val (_, _, p2) = ols(x.slice(k, hi), y.slice(k, hi))
        if (p1 + p2 < bestP) { bestP = p1 + p2; bestK = k }
        k += 1
      }
      if (bestK < 0 || bestP > pStop) out += ((lo, hi))
      else { split(lo, bestK); split(bestK, hi) }
    }
    split(0, x.length)
    out.toArray
  }
}
