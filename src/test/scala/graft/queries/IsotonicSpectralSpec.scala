package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7: isotonic calibration (vs a classic sequential PAVA
  * replay — different algorithm, provably identical fit) and the
  * weekly periodogram (vs a plain-Scala Goertzel bin).
  */
class IsotonicSpectralSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("eval_isotonic equals sequential PAVA and is monotone") {
    val got = MlExtra.isotonic(spark, dir).collect()
    assert(got.length == 10)
    val n = got.map(_.getLong(1)); val p = got.map(_.getLong(2))
    // classic PAVA: pool adjacent violators left-to-right
    case class Pool(var n: Long, var p: Long) {
      def avg: Double = p.toDouble / n.toDouble
    }
    val pools = scala.collection.mutable.ArrayBuffer[Pool]()
    (0 until 10).foreach { i =>
      pools += Pool(n(i), p(i))
      while (pools.length > 1 &&
        pools(pools.length - 2).avg >= pools.last.avg) {
        val last = pools.remove(pools.length - 1)
        pools.last.n += last.n; pools.last.p += last.p
      }
    }
    // expand pools back to per-bin fitted values
    val fit = scala.collection.mutable.ArrayBuffer[Double]()
    var idx = 0
    pools.foreach { q =>
      var taken = 0L
      while (taken < q.n) { fit += q.avg; taken += n(idx); idx += 1 }
    }
    assert(fit.length == 10)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getDouble(4) - fit(i)) < 1e-12, s"iso @ bin $i")
    }
    // monotone non-decreasing
    got.map(_.getDouble(4)).sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-15)
      case _ =>
    }
    // pooling preserves total mass: Σ iso*n == Σ pos
    val mass = got.map(r => r.getDouble(4) * r.getLong(1)).sum
    assert(math.abs(mass - p.sum) < 1e-6)
  }

  test("ts_periodogram equals a plain-Scala Goertzel bin replay") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_type"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400000L))
    val cq = (0 to 6).map(k => math.round(math.cos(2.0 * math.Pi * k / 7.0) * 1e6))
    val sq = (0 to 6).map(k => math.round(math.sin(2.0 * math.Pi * k / 7.0) * 1e6))
    val got = Spectral.periodogram(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val daily = ev.filter(_._1 == t).groupBy(_._2).view
        .mapValues(_.size.toLong).toMap
      val a = daily.map { case (d, c) => c * cq((d % 7).toInt) }.sum
      val b = daily.map { case (d, c) => c * sq((d % 7).toInt) }.sum
      assert(r.getLong(1) == daily.size.toLong)
      assert(r.getLong(2) == a, s"a_micro @ $t")
      assert(r.getLong(3) == b, s"b_micro @ $t")
      val ad = a.toDouble / 1000000.0; val bd = b.toDouble / 1000000.0
      assert(r.getDouble(4) == ad * ad + bd * bd)
    }
  }
}
