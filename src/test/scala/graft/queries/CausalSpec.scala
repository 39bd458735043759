package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 causal-inference quartet: plain-Scala references for the
  * RDD, QTE, matching, and post-stratification queries at sf0.001 —
  * every assert is `==` on doubles/longs (the determinism bar:
  * bit-identical, not approximately equal).
  */
class CausalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def coin(salt: String, k: Long): Long =
    java.lang.Long.parseLong(md5hex(s"$salt$k").take(8), 16) % 2L

  /** (custkey, nationkey, segment, x = acctbal cents, y = spend cents). */
  private lazy val custs: Array[(Long, Int, String, Long, Long)] = {
    val spendByCust = graft.Tables(spark, sf, "orders")
      .collect().map(r => (r.getLong(1), math.round(r.getDouble(3) * 100.0)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    graft.Tables(spark, sf, "customer").collect().map { r =>
      val ck = r.getLong(0)
      (ck, r.getInt(2), r.getString(4), math.round(r.getDouble(3) * 100.0),
        spendByCust.getOrElse(ck, 0L))
    }
  }

  test("eval_rdd equals a plain-Scala two-sided local OLS") {
    val h = 100000L
    val bw = custs.filter(c => c._4 >= -h && c._4 <= h)
    def fit(rows: Array[(Long, Int, String, Long, Long)]) = {
      val n = rows.length.toLong
      val sx = rows.map(r => BigInt(r._4)).sum
      val sy = rows.map(r => BigInt(r._5)).sum
      val sxy = rows.map(r => BigInt(r._4) * BigInt(r._5)).sum
      val sxx = rows.map(r => BigInt(r._4) * BigInt(r._4)).sum
      val (nd, dsx, dsy, dsxy, dsxx) =
        (n.toDouble, sx.toDouble, sy.toDouble, sxy.toDouble, sxx.toDouble)
      val den = nd * dsxx - dsx * dsx
      if (n < 2 || den == 0.0) (n, None, None)
      else {
        val slope = (nd * dsxy - dsx * dsy) / den
        (n, Some(slope), Some((dsy - slope * dsx) / nd))
      }
    }
    val (nl, sl, il) = fit(bw.filter(_._4 < 0))
    val (nr, sr, ir) = fit(bw.filter(_._4 >= 0))
    val r = Causal.evalRdd(spark, sf).collect().head
    assert(r.getLong(0) == nl && r.getLong(1) == nr, "side counts")
    assert(r.getDouble(2) == sl.get && r.getDouble(3) == sr.get, "slopes")
    assert(r.getDouble(4) == il.get && r.getDouble(5) == ir.get, "intercepts")
    assert(r.getDouble(6) == ir.get - il.get, "effect")
  }

  test("eval_qte equals plain-Scala per-arm order statistics") {
    val perUser = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100.0)))
      .groupBy(_._1).toSeq
      .map { case (u, v) => (coin("qte:", u), v.map(_._2).sum) }
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).sorted }
    val got = Causal.evalQte(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(25L, 50L, 75L))
    got.foreach { r =>
      val p = r.getLong(0)
      val (c, t) = (perUser(0L), perUser(1L))
      def q(v: Seq[Long]): Long = v(((p * (v.size - 1)) / 100).toInt)
      assert(r.getLong(1) == c.size && r.getLong(2) == t.size, s"n at p=$p")
      assert(r.getLong(3) == q(c) && r.getLong(4) == q(t), s"quantiles at p=$p")
      assert(r.getLong(5) == q(t) - q(c), s"qte at p=$p")
    }
  }

  test("eval_matching equals a brute-force stratified 1-NN match") {
    val treat = custs.filter(c => coin("match:", c._1) == 1L)
    val ctrl = custs.filter(c => coin("match:", c._1) == 0L)
      // one representative per (stratum, x): smallest custkey
      .groupBy(c => (c._2, c._3, c._4))
      .map { case (k, v) => k -> v.minBy(_._1)._5 }
    var (nMatched, sumDy, sumAdx) = (0L, 0L, 0L)
    treat.foreach { t =>
      val inStratum = ctrl.filter { case ((nk, seg, _), _) =>
        nk == t._2 && seg == t._3 }
      val back = inStratum.filter(_._1._3 <= t._4)
        .reduceOption((a, b) => if (a._1._3 >= b._1._3) a else b)
      val fwd = inStratum.filter(_._1._3 >= t._4)
        .reduceOption((a, b) => if (a._1._3 <= b._1._3) a else b)
      val takeB = fwd.isEmpty || (back.nonEmpty &&
        t._4 - back.get._1._3 <= fwd.get._1._3 - t._4)
      val m = if (takeB) back else fwd
      m.foreach { mm =>
        nMatched += 1
        sumDy += t._5 - mm._2
        sumAdx += math.abs(t._4 - mm._1._3)
      }
    }
    val r = Causal.evalMatching(spark, sf).collect().head
    assert(r.getLong(0) == treat.length && r.getLong(1) == nMatched, "counts")
    assert(r.getLong(2) == sumDy && r.getLong(3) == sumAdx, "integer sums")
    assert(r.getDouble(4) == sumDy.toDouble / nMatched.toDouble, "att")
    assert(r.getDouble(5) == sumAdx.toDouble / nMatched.toDouble, "mean |dx|")
  }

  test("eval_poststrat equals a plain-Scala stratified estimator") {
    val byeSeg = custs.map(c => (c._3, coin("ps:", c._1), c._5))
      .groupBy(_._1)
    val segs = byeSeg.toSeq.sortBy(_._1).map { case (seg, rows) =>
      def arm(t: Long) = rows.filter(_._2 == t).map(_._3)
      val (c, t) = (arm(0L), arm(1L))
      val (nc, nt) = (c.length.toLong, t.length.toLong)
      def mv(v: Array[Long]) = {
        val s = v.map(BigInt(_)).sum.toDouble
        val ss = v.map(x => BigInt(x) * BigInt(x)).sum.toDouble
        val n = v.length.toDouble
        (s / n, (n * ss - s * s) / (n * (n - 1.0)))
      }
      val inc = nc > 1 && nt > 1
      if (inc) {
        val ((mc, vc), (mt, vt)) = (mv(c), mv(t))
        (seg, nc, nt, mc, mt, mt - mc, vc, vt, true)
      } else (seg, nc, nt, 0.0, 0.0, 0.0, 0.0, 0.0, false)
    }
    val nInc = segs.filter(_._9).map(s => s._2 + s._3).sum
    val terms = segs.map { s =>
      if (!s._9) (s._1, None, None) else {
        val w = (s._2 + s._3).toDouble / nInc.toDouble
        (s._1, Some(w * s._6),
          Some(w * w * (s._7 / s._2.toDouble + s._8 / s._3.toDouble)))
      }
    }
    val ate = terms.flatMap(_._2).foldLeft(0.0)(_ + _)
    val se = math.sqrt(terms.flatMap(_._3).foldLeft(0.0)(_ + _))
    val got = Causal.evalPoststrat(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == segs.map(_._1))
    got.zip(segs).foreach { case (r, s) =>
      assert(r.getLong(1) == s._2 && r.getLong(2) == s._3, s"counts ${s._1}")
      if (s._9) {
        assert(r.getDouble(3) == s._4 && r.getDouble(4) == s._5, s"means ${s._1}")
        assert(r.getDouble(5) == s._6, s"effect ${s._1}")
      }
      assert(r.getDouble(7) == ate && r.getDouble(8) == se, s"pooled ${s._1}")
    }
  }
}
