package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 decisioning plane: plain-Scala references for the
  * sequential-monitoring, IV/CACE, heterogeneity, policy-replay, and
  * depth-2-tree queries at sf0.001 — every assert is `==` on doubles
  * (the determinism bar: bit-identical, not approximately equal).
  */
class DecisioningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def didTreat(uid: Long): Long =
    java.lang.Long.parseLong(md5hex(s"did:$uid").take(8), 16) % 2L

  private def ivU(uid: Long): Long =
    java.lang.Long.parseLong(md5hex(s"iv:$uid").take(8), 16)

  private def d2(v: Double): BigDecimal =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  private lazy val events: Array[(Long, Double, Long, String)] =
    graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("value"),
        (unix_millis(col("ts")) / lit(86400000L)).cast("long"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))

  test("eval_sequential equals a plain-Scala cumulative Welch-z chain") {
    val d0 = events.map(_._3).min
    val byLook = events.groupBy { case (_, _, day, _) =>
      math.min((day - d0) / 6 + 1, 5L)
    }
    val looks = byLook.keys.toSeq.sorted
    // cumulative per-arm moments in look order
    var cells = Map[Long, (Long, Long, BigDecimal, BigDecimal, BigDecimal, BigDecimal)]()
    var acc = (0L, 0L, BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0))
    looks.foreach { k =>
      val g = byLook(k)
      def arm(t: Long) = g.filter(e => didTreat(e._1) == t).map(e => d2(e._2))
      val (c, t) = (arm(0L), arm(1L))
      acc = (acc._1 + c.size, acc._2 + t.size,
        acc._3 + c.sum, acc._4 + t.sum,
        acc._5 + c.map(v => v * v).sum, acc._6 + t.map(v => v * v).sum)
      cells += k -> acc
    }
    val got = Decisioning.evalSequential(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == looks)
    got.foreach { r =>
      val k = r.getLong(0)
      val (nc, nt, sc, st, ssc, sst) = cells(k)
      assert(r.getLong(1) == nc && r.getLong(2) == nt, s"look $k ns")
      def mv(n: Long, s: BigDecimal, ss: BigDecimal): (Double, Option[Double]) = {
        val nd = n.toDouble; val sd = s.toDouble; val ssd = ss.toDouble
        (sd / nd,
          if (n > 1) Some((nd * ssd - sd * sd) / (nd * (nd - 1.0))) else None)
      }
      val (mc, vc) = mv(nc, sc, ssc)
      val (mt, vt) = mv(nt, st, sst)
      assert(r.getDouble(3) == mc && r.getDouble(4) == mt, s"look $k means")
      val se = math.sqrt(vc.get / nc.toDouble + vt.get / nt.toDouble)
      val z = (mt - mc) / se
      val bound = 2.04 * math.sqrt(5.0 / k.toDouble)
      assert(r.getDouble(5) == z, s"look $k z")
      assert(r.getDouble(6) == bound, s"look $k bound")
      assert(r.getInt(7) == (if (math.abs(z) > bound) 1 else 0), s"look $k crossed")
    }
    // the boundary must tighten monotonically toward the final look
    val bounds = got.map(_.getDouble(6))
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a > b })
  }

  test("eval_cace equals a plain-Scala Wald/IV estimator") {
    // per-user outcome over ALL events (null values contribute nothing)
    val allEv = graft.Tables(spark, sf, "events")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val perUser = allEv.groupBy(_._1).map { case (u, rs) =>
      u -> rs.flatMap(_._2).map(v =>
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
    }
    def taken(u: Long): Boolean =
      if (didTreat(u) == 1L) ivU(u) < 3006477107L else ivU(u) < 858993459L
    val z0 = perUser.filter(p => didTreat(p._1) == 0L)
    val z1 = perUser.filter(p => didTreat(p._1) == 1L)
    val t0 = z0.count(p => taken(p._1)).toLong
    val t1 = z1.count(p => taken(p._1)).toLong
    val sy0 = z0.values.sum.toDouble; val sy1 = z1.values.sum.toDouble
    val tu0 = t0.toDouble / z0.size.toDouble
    val tu1 = t1.toDouble / z1.size.toDouble
    val itt = sy1 / z1.size.toDouble - sy0 / z0.size.toDouble
    val r = Decisioning.evalCace(spark, sf).collect().head
    assert(r.getLong(0) == z0.size && r.getLong(1) == z1.size)
    assert(r.getDouble(2) == tu0 && r.getDouble(3) == tu1)
    assert(r.getDouble(4) == itt)
    assert(r.getDouble(5) == tu1 - tu0)
    assert(r.getDouble(6) == itt / (tu1 - tu0))
    // the encouragement rates must actually separate the arms
    assert(tu1 > tu0)
  }

  test("eval_hte equals a plain-Scala inverse-variance pool with Cochran's Q") {
    val segs = events.groupBy(_._4).toSeq.sortBy(_._1)
    final case class S(seg: String, nc: Long, nt: Long, mc: Double, mt: Double,
      d: Double, v: Double, w: Option[Double])
    val refs = segs.map { case (seg, g) =>
      def arm(t: Long) = g.filter(e => didTreat(e._1) == t).map(e => d2(e._2))
      val (c, t) = (arm(0L), arm(1L))
      def mv(vs: Seq[BigDecimal]): (Double, Double) = {
        val n = vs.size.toDouble
        val s = vs.sum.toDouble
        val ss = vs.map(v => v * v).sum.toDouble
        (s / n, (n * ss - s * s) / (n * (n - 1.0)))
      }
      val (mc, vc) = mv(c); val (mt, vt) = mv(t)
      val d = mt - mc
      val v = vc / c.size.toDouble + vt / t.size.toDouble
      S(seg, c.size, t.size, mc, mt, d, v, if (v > 0) Some(1.0 / v) else None)
    }
    val weighted = refs.filter(_.w.isDefined)
    val sumW = weighted.foldLeft(0.0)((a, s) => a + s.w.get)
    val sumWd = weighted.foldLeft(0.0)((a, s) => a + s.w.get * s.d)
    val dbar = sumWd / sumW
    val q = weighted.foldLeft(0.0)((a, s) =>
      a + s.w.get * (s.d - dbar) * (s.d - dbar))
    val df = weighted.size - 1
    val i2 = math.max(0.0, (q - df.toDouble) / q)
    val got = Decisioning.evalHte(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == refs.map(_.seg))
    got.zip(refs).foreach { case (r, s) =>
      assert(r.getLong(1) == s.nc && r.getLong(2) == s.nt, s"${s.seg} ns")
      assert(r.getDouble(3) == s.mc && r.getDouble(4) == s.mt, s"${s.seg} means")
      assert(r.getDouble(5) == s.d && r.getDouble(6) == s.v, s"${s.seg} effect")
      assert(r.getDouble(7) == s.w.get, s"${s.seg} weight")
      assert(r.getDouble(8) == q && r.getLong(9) == df.toLong &&
        r.getDouble(10) == i2, s"${s.seg} pooled")
    }
  }

  test("eval_bandit equals a plain-Scala greedy replay with hindsight regret") {
    val d0 = events.map(_._3).min
    val byDayArm = events.groupBy(e => (e._3 - d0, e._4))
      .view.mapValues(g => (g.size.toLong, g.map(e => d2(e._2)).sum)).toMap
    val days = events.map(_._3 - d0).distinct.sorted
    val arms = events.map(_._4).distinct.sorted
    def cell(day: Long, arm: String): (Long, BigDecimal) =
      byDayArm.getOrElse((day, arm), (0L, BigDecimal(0)))
    def rDay(day: Long, arm: String): Double = {
      val (n, s) = cell(day, arm)
      if (n > 0) s.toDouble / n.toDouble else 0.0
    }
    // best fixed arm in hindsight
    val bestArm = arms.map { a =>
      val tot = days.map(cell(_, a))
      val n = tot.map(_._1).sum
      (a, if (n > 0) Some(tot.map(_._2).sum.toDouble / n.toDouble) else None)
    }.sortBy { case (a, m) => (m.map(-_).getOrElse(Double.MaxValue), a) }.head._1
    // greedy choice per day on cumulative prior means
    var hist = arms.map(_ -> (0L, BigDecimal(0))).toMap
    val expected = days.map { day =>
      val chosen = arms.map { a =>
        val (n, s) = hist(a)
        (a, if (n > 0) Some(s.toDouble / n.toDouble) else None)
      }.sortBy { case (a, m) => (m.map(-_).getOrElse(Double.MaxValue), a) }.head._1
      arms.foreach { a =>
        val (n, s) = cell(day, a); val (hn, hs) = hist(a)
        hist += a -> (hn + n, hs + s)
      }
      val rc = rDay(day, chosen); val rb = rDay(day, bestArm)
      (day, chosen, rc, bestArm, rb, rb - rc)
    }
    val total = expected.foldLeft(0.0)((a, e) => a + e._6)
    val got = Decisioning.evalBandit(spark, sf).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (day, ca, rc, ba, rb, reg)) =>
      assert(r.getLong(0) == day)
      assert(r.getString(1) == ca && r.getDouble(2) == rc, s"day $day chosen")
      assert(r.getString(3) == ba && r.getDouble(4) == rb, s"day $day best")
      assert(r.getDouble(5) == reg && r.getDouble(6) == total, s"day $day regret")
    }
  }

  test("ml_tree equals a plain-Scala depth-2 CART") {
    val li = graft.Tables(spark, sf, "lineitem")
      .select(round(col("l_extendedprice") * 100.0).cast("long"),
        col("l_quantity").cast("long"),
        round(col("l_discount") * 100.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val f0 = Math.floorDiv(li.map(_._1).sum, li.length.toLong)
    val rows = li.map { case (y, q, d) => (q, d, y - f0) }

    final case class Best(t: Long, nl: Long, nr: Long, sl: Long, sr: Long,
      ll: Long, lr: Long, gain: Double)
    def stump(rs: Seq[(Long, Long, Long)], fv: ((Long, Long, Long)) => Long): Option[Best] = {
      val hist = rs.groupBy(fv).map { case (t, g) =>
        (t, g.size.toLong, g.map(_._3).sum)
      }.toSeq.sortBy(_._1)
      val nn = hist.map(_._2).sum; val ss = hist.map(_._3).sum
      var nl = 0L; var sl = 0L
      val cands = hist.flatMap { case (t, cn, cs) =>
        nl += cn; sl += cs
        val nr = nn - nl; val srr = ss - sl
        if (nr > 0)
          Some(Best(t, nl, nr, sl, srr, sl / nl, srr / nr,
            sl.toDouble * sl.toDouble / nl.toDouble +
              srr.toDouble * srr.toDouble / nr.toDouble))
        else None
      }
      if (cands.isEmpty) None else Some(cands.minBy(b => (-b.gain, b.t)))
    }
    def sse(rs: Seq[(Long, Long, Long)], b: Best,
        fv: ((Long, Long, Long)) => Long): (BigInt, BigInt) = {
      val before = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val after = rs.map { r =>
        val leaf = if (fv(r) <= b.t) b.ll else b.lr
        BigInt(r._3 - leaf) * BigInt(r._3 - leaf)
      }.sum
      (before, after)
    }
    val rootB = stump(rows, _._1).get
    val left = rows.filter(_._1 <= rootB.t)
    val right = rows.filter(_._1 > rootB.t)
    val nodes = Seq(
      ("L", "l_discount", left, stump(left, (r: (Long, Long, Long)) => r._2),
        (r: (Long, Long, Long)) => r._2),
      ("R", "l_discount", right, stump(right, (r: (Long, Long, Long)) => r._2),
        (r: (Long, Long, Long)) => r._2),
      ("root", "l_quantity", rows, Some(rootB),
        (r: (Long, Long, Long)) => r._1)).collect {
      case (label, fname, rs, Some(b), fv) =>
        val (before, after) = sse(rs, b, fv)
        (label, fname, b, before, after)
    }
    val got = MlExtra.mlTree(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == nodes.map(_._1))
    got.zip(nodes).foreach { case (r, (label, fname, b, before, after)) =>
      assert(r.getString(1) == fname, s"$label feature")
      assert(r.getLong(2) == b.t && r.getLong(3) == b.nl && r.getLong(4) == b.nr,
        s"$label split")
      assert(r.getLong(5) == b.sl && r.getLong(6) == b.sr, s"$label sums")
      assert(r.getLong(7) == b.ll && r.getLong(8) == b.lr, s"$label leaves")
      assert(r.getDouble(9) == b.gain, s"$label gain")
      assert(r.getDouble(10) == before.toDouble, s"$label sse_before")
      assert(r.getDouble(11) == after.toDouble, s"$label sse_after")
      assert(r.getLong(12) == b.nl + b.nr, s"$label n_total")
    }
    // children partition the root's rows
    val Seq(lRow, rRow) = got.filter(r => r.getString(0) != "root").toSeq
    assert(lRow.getLong(12) + rRow.getLong(12) == got.find(_.getString(0) == "root").get.getLong(12))
  }
}
