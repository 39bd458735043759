package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** eval_qini / ts_xcorr vs plain-Scala references. */
class QiniXcorrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex8(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("eval_qini equals the plain-Scala cumulative uplift") {
    val rows = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .collect().map { r =>
        val v = math.round(r.getDouble(1) * 100.0)
        val y = if (r.getString(2) == "F") 1L else 0L
        val t = md5hex8("up:" + r.getLong(0)) % 2
        (v, y, t)
      }
    val n = rows.length
    // exact descending deciles over the cumulative rank of v
    val sorted = rows.map(_._1).sorted
    val firstRank = sorted.zipWithIndex.groupBy(_._1).view
      .mapValues(_.map(_._2).min + 1).toMap
    val cnt = rows.map(_._1).groupBy(identity).view.mapValues(_.length).toMap
    def dbin(v: Long): Long = {
      val cum = firstRank(v) + cnt(v) - 1
      9L - (cum - 1) * 10 / n
    }
    val byBin = rows.groupBy(r => dbin(r._1))
    val bins = (0L to 9L).flatMap(b => byBin.get(b).map(b -> _)).toMap
    var cumNt = 0L; var cumNc = 0L; var cumYt = 0L; var cumYc = 0L
    val got = FeatureQueries.evalQini(spark, dir).collect()
    val gotByBin = got.map(r => r.getLong(0) -> r).toMap
    bins.keys.toSeq.sorted.foreach { b =>
      val rs = bins(b)
      cumNt += rs.count(_._3 == 1); cumNc += rs.count(_._3 == 0)
      cumYt += rs.filter(_._3 == 1).map(_._2).sum
      cumYc += rs.filter(_._3 == 0).map(_._2).sum
      val r = gotByBin(b)
      assert(r.getLong(5) == cumNt && r.getLong(6) == cumNc &&
        r.getLong(7) == cumYt && r.getLong(8) == cumYc, s"bin $b cums")
      if (cumNc > 0) {
        val q = cumYt.toDouble - cumYc.toDouble * (cumNt.toDouble / cumNc.toDouble)
        assert(math.abs(r.getAs[Double]("qini") - q) < 1e-9, s"bin $b qini")
      }
    }
  }

  test("ts_xcorr equals the plain-Scala lagged Pearson r on the zero-filled spine") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400000L))
    val d0 = ev.map(_._2).min; val d1 = ev.map(_._2).max
    val xs = ev.filter(_._1 == "click").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ys = ev.filter(_._1 == "purchase").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val days = (d0 to d1).toArray
    val got = TimeSeriesQueries.tsXcorr(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    (0L to 7L).foreach { lag =>
      val pairs = days.filter(_ + lag <= d1)
        .map(d => (xs.getOrElse(d, 0L).toDouble, ys.getOrElse(d + lag, 0L).toDouble))
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      val r = got(lag)
      assert(r.getLong(1) == pairs.length, s"lag $lag n")
      if (vx != 0 && vy != 0)
        assert(math.abs(r.getAs[Double]("r") - num / (math.sqrt(vx) * math.sqrt(vy))) < 1e-9,
          s"lag $lag r")
    }
  }
}
