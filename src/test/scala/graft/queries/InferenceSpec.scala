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
