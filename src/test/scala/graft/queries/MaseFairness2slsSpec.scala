package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plain-Scala references for eval_2sls, ts_mase, and
  * fairness_report at sf0.001 — all asserts `==` on doubles/longs.
  */
class MaseFairness2slsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("eval_2sls equals a plain-Scala ratio-of-covariances chain") {
    val rows = graft.Tables(spark, sf, "events")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) 0L
        else math.round(r.getDouble(1) * 100.0)))
    val pu = rows.groupBy(_._1).toSeq.map { case (u, l) =>
      (java.lang.Long.parseLong(md5hex(s"iv2:$u").take(8), 16) % 1000L,
        l.size.toLong, l.map(_._2).sum)
    }
    val n = pu.size.toLong
    def bsum(f: ((Long, Long, Long)) => BigInt) = pu.map(f).sum.toDouble
    val (sz, sx, sy) = (bsum(r => BigInt(r._1)), bsum(r => BigInt(r._2)),
      bsum(r => BigInt(r._3)))
    val szx = bsum(r => BigInt(r._1) * BigInt(r._2))
    val szy = bsum(r => BigInt(r._1) * BigInt(r._3))
    val szz = bsum(r => BigInt(r._1) * BigInt(r._1))
    val sxx = bsum(r => BigInt(r._2) * BigInt(r._2))
    val sxy = bsum(r => BigInt(r._2) * BigInt(r._3))
    val nd = n.toDouble
    val czx = szx - sz * sx / nd
    val czy = szy - sz * sy / nd
    val czz = szz - sz * sz / nd
    val cxx = sxx - sx * sx / nd
    val cxy = sxy - sx * sy / nd
    val ssr = czx * czx / czz
    val r = Causal.eval2sls(spark, sf).collect().head
    assert(r.getLong(0) == n, "n")
    assert(r.getDouble(1) == czy / czx, "beta_iv")
    assert(r.getDouble(2) == cxy / cxx, "beta_ols")
    assert(r.getDouble(3) == czx / czz, "first-stage beta")
    assert(r.getDouble(4) == ssr / ((cxx - ssr) / (nd - 2.0)), "F")
  }

  test("ts_mase equals a plain-Scala seasonal-naive error ratio") {
    val daily = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts").cast("date").cast("string"),
        col("value")).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        math.round(r.getDouble(2) * 1000000.0)))
      .groupBy(_._1).map { case (k, v) => (k._1, k._2, v.map(_._2).sum) }
      .toSeq
    val byType = daily.groupBy(_._1)
    val out = TsExtra.mase(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq == byType.keys.toSeq.sorted)
    out.foreach { r =>
      val obs = byType(r.getString(0)).sortBy(_._2)
      val series = obs.map(_._3)
      val n = series.size
      // weekly leg is CALENDAR-based: value observed exactly 7 days
      // earlier, skipped when that day is absent from the grid
      val byDay = obs.map(o => (java.time.LocalDate.parse(o._2), o._3)).toMap
      val e7 = obs.flatMap { case (_, d, v) =>
        byDay.get(java.time.LocalDate.parse(d).minusDays(7))
          .map(p => math.abs(v - p))
      }
      val e1 = (1 until n).map(i => math.abs(series(i) - series(i - 1)))
      assert(r.getLong(1) == n.toLong && r.getLong(2) == e7.size.toLong &&
        r.getLong(3) == e1.size.toLong, s"counts ${r.getString(0)}")
      assert(r.getLong(4) == e7.sum && r.getLong(5) == e1.sum,
        s"integer error sums ${r.getString(0)}")
      val mae7 = e7.sum.toDouble / e7.size.toDouble
      val mae1 = e1.sum.toDouble / e1.size.toDouble
      assert(r.getDouble(6) == mae7 && r.getDouble(7) == mae1,
        s"maes ${r.getString(0)}")
      assert(r.getDouble(8) == mae7 / mae1, s"mase ${r.getString(0)}")
    }
  }

  test("ts_bollinger equals a plain-Scala rolling-band replay") {
    val daily = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts").cast("date").cast("string"),
        col("value")).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        math.round(r.getDouble(2) * 1000000.0)))
      .groupBy(_._1).map { case (k, v) => (k._1, k._2, v.map(_._2).sum) }
      .toSeq
    val got = TsExtra.bollinger(spark, sf).collect()
    val byType = daily.groupBy(_._1)
    got.foreach { r =>
      val series = byType(r.getString(0)).sortBy(_._2)
      val wins = series.sliding(20).filter(_.size == 20).toSeq
      var (up, dn) = (0L, 0L)
      var last: (String, Double, Double, Double, Double) = null
      wins.foreach { w =>
        val sx = w.map(_._3).sum
        val sxx = w.map(x => BigInt(x._3) * BigInt(x._3)).sum
        val mean = sx.toDouble / 20.0
        val sigma = math.sqrt(sxx.toDouble / 20.0 - mean * mean)
        val (u, l) = (mean + 2.0 * sigma, mean - 2.0 * sigma)
        val dv = w.last._3.toDouble
        if (dv > u) up += 1
        if (dv < l) dn += 1
        last = (w.last._2, mean, sigma, u, l)
      }
      assert(r.getLong(1) == wins.size.toLong, s"windows ${r.getString(0)}")
      assert(r.getLong(2) == up && r.getLong(3) == dn,
        s"breaches ${r.getString(0)}")
      if (last != null) {
        assert(r.getString(4) == last._1, s"last day ${r.getString(0)}")
        assert(r.getDouble(5) == last._2 && r.getDouble(6) == last._3 &&
          r.getDouble(7) == last._4 && r.getDouble(8) == last._5,
          s"last bands ${r.getString(0)}")
      }
    }
  }

  test("fairness_report equals a brute-force audit") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("source"), col("n_chars"), col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "en"))
    val sorted = docs.map(_._2).sorted
    val med = sorted(((sorted.length - 1) / 2).toInt)
    val byS = docs.groupBy(_._1)
    case class Cell(n: Long, sel: Long, tp: Long, fn: Long, fp: Long, tn: Long) {
      def selRate: Double = sel.toDouble / n.toDouble
      def tpr: Option[Double] = if (tp + fn > 0)
        Some(tp.toDouble / (tp + fn).toDouble) else None
    }
    val cells = byS.toSeq.sortBy(_._1).map { case (src, l) =>
      val pred = l.map(d => (d._2 >= med, d._3))
      src -> Cell(l.size.toLong, pred.count(_._1).toLong,
        pred.count(p => p._1 && p._2).toLong,
        pred.count(p => !p._1 && p._2).toLong,
        pred.count(p => p._1 && !p._2).toLong,
        pred.count(p => !p._1 && !p._2).toLong)
    }
    val sels = cells.map(_._2.selRate)
    val tprs = cells.flatMap(_._2.tpr)
    val dp = sels.max - sels.min
    val di = sels.min / sels.max
    val eo = tprs.max - tprs.min
    val got = Fairness.report(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == cells.map(_._1))
    got.zip(cells).foreach { case (r, (src, c)) =>
      assert(r.getLong(1) == c.n && r.getLong(2) == c.sel, s"counts $src")
      assert(r.getLong(3) == c.tp && r.getLong(4) == c.fn &&
        r.getLong(5) == c.fp && r.getLong(6) == c.tn, s"confusion $src")
      assert(r.getDouble(7) == c.selRate, s"sel_rate $src")
      c.tpr.foreach(t => assert(r.getDouble(8) == t, s"tpr $src"))
      assert(r.getDouble(10) == dp && r.getDouble(11) == di &&
        r.getDouble(12) == eo, s"pooled $src")
    }
  }
}
