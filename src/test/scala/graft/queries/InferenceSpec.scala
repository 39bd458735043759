package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The [[Inference]] hypothesis-test completions certified against
  * independent plain-Scala references (the DuckDB oracle runs in the
  * driver gate): Mann–Whitney U with tie correction, Brown–Forsythe
  * median-centered Levene, and Jarque–Bera moments.
  */
class InferenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def quantities(): Array[(String, Long)] =
    graft.Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("stats_mannwhitney equals the plain-Scala tie-corrected U and z") {
    val r = Inference.statsMannwhitney(spark, dir).collect().head
    val data = quantities().filter(d => d._1 == "A" || d._1 == "R")
    val n = data.length
    val counts = data.map(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val sorted = data.map(_._2).sorted
    val avgRank = counts.keys.map { v =>
      val lo = sorted.indexWhere(_ == v) + 1
      v -> (lo + (counts(v) - 1) / 2.0)
    }.toMap
    val a = data.filter(_._1 == "A")
    val nA = a.length.toDouble
    val nR = (n - a.length).toDouble
    val rA = a.map(d => avgRank(d._2)).sum
    val u = rA - nA * (nA + 1.0) / 2.0
    val tie = counts.values.map(c => c.toLong * c * c - c).sum.toDouble
    val varU = nA * nR / 12.0 *
      ((n + 1.0) - tie / (n.toDouble * (n - 1.0)))
    val z = (u - nA * nR / 2.0) / math.sqrt(varU)
    assert(r.getAs[Long]("n_a") == a.length)
    assert(r.getAs[Long]("n_r") == n - a.length)
    assert(math.abs(r.getAs[Double]("u_a") - u) < 1e-6 * math.abs(u))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-9,
      s"z ${r.getAs[Double]("z")} vs $z")
  }

  test("stats_levene equals the plain-Scala Brown–Forsythe F") {
    val r = Inference.statsLevene(spark, dir).collect().head
    val byG = quantities().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // lower median, the (n+1)/2-th order statistic
    def med(vs: Array[Long]): Long = vs.sorted.apply((vs.length + 1) / 2 - 1)
    val devs = byG.map { case (g, vs) =>
      val m = med(vs); g -> vs.map(v => math.abs(v - m).toDouble)
    }
    val k = devs.size.toDouble
    val nTot = devs.values.map(_.length).sum.toDouble
    val gm = devs.values.flatten.sum / nTot
    val ssw = devs.values.map { ds =>
      val m = ds.sum / ds.length; ds.map(d => (d - m) * (d - m)).sum
    }.sum
    val ssb = devs.values.map { ds =>
      val m = ds.sum / ds.length; ds.length * (m - gm) * (m - gm)
    }.sum
    val f = (ssb / (k - 1.0)) / (ssw / (nTot - k))
    assert(r.getAs[Long]("k") == devs.size)
    assert(r.getAs[Long]("n") == nTot.toLong)
    assert(math.abs(r.getAs[Double]("f") - f) < 1e-9 * math.abs(f),
      s"f ${r.getAs[Double]("f")} vs $f")
  }

  test("stats_cohens_d equals the plain-Scala pooled effect size") {
    val r = Inference.statsCohensD(spark, dir).collect().head
    val data = quantities().filter(d => d._1 == "A" || d._1 == "R")
    def stats(g: String): (Int, Double, Double) = {
      val vs = data.filter(_._1 == g).map(_._2.toDouble)
      val m = vs.sum / vs.length
      (vs.length, m, vs.map(v => (v - m) * (v - m)).sum)
    }
    val (na, ma, ssa) = stats("A"); val (nr, mr, ssr) = stats("R")
    val sp = math.sqrt((ssa + ssr) / (na + nr - 2.0))
    val d = (ma - mr) / sp
    val g = d * (1.0 - 3.0 / (4.0 * (na + nr) - 9.0))
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_r") == nr)
    assert(math.abs(r.getAs[Double]("d") - d) < 1e-9, "d")
    assert(math.abs(r.getAs[Double]("g_hedges") - g) < 1e-9, "g")
  }

  test("stats_cramers_v equals the plain-Scala chi2/V") {
    val r = Inference.statsCramersV(spark, dir).collect().head
    val cells = graft.Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .collect().map(x => (x.getString(0), x.getString(1)))
    val n = cells.length.toDouble
    val obs = cells.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val rt = cells.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val chi2 = obs.map { case ((a, b), o) =>
      val e = rt(a) * ct(b) / n; (o - e) * (o - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n * (math.min(rt.size, ct.size) - 1)))
    assert(r.getAs[Long]("n") == cells.length)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-9 * (1 + chi2), "chi2")
    assert(math.abs(r.getAs[Double]("v") - v) < 1e-9, "v")
  }

  test("eval_regression equals the plain-Scala seasonal-naive metrics") {
    val daily = graft.Tables(spark, dir, "events")
      .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400000L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byType = daily.groupBy(_._1._1)
    val got = FeatureQueries.evalRegression(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    var checked = 0
    byType.foreach { case (t, m) =>
      val days = m.map(_._1._2)
      val pairs = days.toSeq.filter(d => m.contains((t, d - 7)))
        .map(d => (m((t, d)).toDouble, m((t, d - 7)).toDouble))
      if (pairs.nonEmpty && got.contains(t)) {
        val n = pairs.length.toDouble
        val mae = pairs.map(p => math.abs(p._1 - p._2)).sum / n
        val rmse = math.sqrt(pairs.map(p => (p._1 - p._2) * (p._1 - p._2)).sum / n)
        val mean = pairs.map(_._1).sum / n
        val sst = pairs.map(p => (p._1 - mean) * (p._1 - mean)).sum
        val sse = pairs.map(p => (p._1 - p._2) * (p._1 - p._2)).sum
        val r = got(t)
        assert(r.getAs[Long]("n_days") == pairs.length, s"$t n")
        assert(math.abs(r.getAs[Double]("mae") - mae) < 1e-9, s"$t mae")
        assert(math.abs(r.getAs[Double]("rmse") - rmse) < 1e-9, s"$t rmse")
        if (sst > 0)
          assert(math.abs(r.getAs[Double]("r2") - (1.0 - sse / sst)) < 1e-9, s"$t r2")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("stats_jarque_bera equals the plain-Scala moment chain") {
    val rows = Inference.statsJarqueBera(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    quantities().groupBy(_._1).foreach { case (g, ds) =>
      val vs = ds.map(_._2.toDouble)
      val n = vs.length.toDouble
      val mean = vs.sum / n
      val m2 = vs.map(v => (v - mean) * (v - mean)).sum / n
      val m3 = vs.map(v => math.pow(v - mean, 3)).sum / n
      val m4 = vs.map(v => math.pow(v - mean, 4)).sum / n
      val skew = m3 / (m2 * math.sqrt(m2))
      val kurt = m4 / (m2 * m2)
      val jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
      val r = rows(g)
      assert(r.getAs[Long]("n") == vs.length)
      assert(math.abs(r.getAs[Double]("skew") - skew) < 1e-9, s"$g skew")
      assert(math.abs(r.getAs[Double]("kurt") - kurt) < 1e-9, s"$g kurt")
      assert(math.abs(r.getAs[Double]("jb") - jb) < 1e-6 * (1.0 + math.abs(jb)), s"$g jb")
    }
  }
}
