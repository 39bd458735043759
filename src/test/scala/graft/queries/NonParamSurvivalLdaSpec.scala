package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plain-Scala references for the round-9 third-session additions:
  * Cliff's delta, two-sample Anderson–Darling (fixed-point sum),
  * the two-group log-rank test, and closed-form Gaussian LDA — all
  * at sf0.001, all asserts `==` (bit-identical, not approximate).
  */
class NonParamSurvivalLdaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def coin(salt: String, k: Long): Long =
    java.lang.Long.parseLong(md5hex(s"$salt$k").take(8), 16) % 2L

  /** (click values, view values) with multiplicity. */
  private lazy val pairVals: (Seq[Double], Seq[Double]) = {
    val rows = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "view"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    (rows.filter(_._1 == "click").map(_._2).toSeq,
      rows.filter(_._1 == "view").map(_._2).toSeq)
  }

  test("stats_cliffs equals brute-force pair counting") {
    val (xs, ys) = pairVals
    var (gt, lt, ties) = (0L, 0L, 0L)
    for (x <- xs; y <- ys) {
      if (x > y) gt += 1 else if (x < y) lt += 1 else ties += 1
    }
    val r = NonParam.cliffs(spark, sf).collect().head
    assert(r.getLong(0) == xs.size && r.getLong(1) == ys.size, "n/m")
    assert(r.getLong(2) == gt && r.getLong(3) == lt && r.getLong(4) == ties,
      "pair counts")
    val delta = (gt.toDouble - lt.toDouble) / (xs.size.toDouble * ys.size.toDouble)
    assert(r.getDouble(5) == delta, "delta")
    val mag = math.abs(delta) match {
      case d if d < 0.147 => "negligible"
      case d if d < 0.33 => "small"
      case d if d < 0.474 => "medium"
      case _ => "large"
    }
    assert(r.getString(6) == mag, "magnitude")
  }

  test("stats_ad equals a plain-Scala fixed-point A2 over the pooled ECDF") {
    val (xs, ys) = pairVals
    val (n, m) = (xs.size.toLong, ys.size.toLong)
    val nn = n + m
    val cx = xs.groupBy(identity).map { case (v, l) => v -> l.size.toLong }
    val cy = ys.groupBy(identity).map { case (v, l) => v -> l.size.toLong }
    val vs = (cx.keySet ++ cy.keySet).toSeq.sorted
    var (a, b, sq, nTerms) = (0L, 0L, BigInt(0), 0L)
    vs.foreach { v =>
      val (hx, hy) = (cx.getOrElse(v, 0L), cy.getOrElse(v, 0L))
      a += hx; b += hy
      if (a + b < nn) {
        nTerms += 1
        val bb = BigInt(a + b)
        val dd = BigInt(nn) * a - BigInt(n) * bb
        val num = BigInt(hx + hy) * dd * dd
        sq += (num * 1048576) / (bb * (BigInt(nn) - bb))
      }
    }
    val a2 = sq.toDouble / 1048576.0 / (n.toDouble + m.toDouble) *
      (1.0 / n.toDouble + 1.0 / m.toDouble)
    val r = NonParam.andersonDarling(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == m && r.getLong(2) == nTerms,
      "counts")
    assert(r.getDouble(3) == sq.toDouble, "fixed-point sum")
    assert(r.getDouble(4) == a2, "A2")
  }

  test("survival_logrank equals a plain-Scala per-duration fold") {
    val ev = graft.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      val t0 = rows.map(_._3).min
      val t1 = rows.map(_._3).max
      val fp = rows.filter(_._2 == "purchase").map(_._3).minOption
      ((fp.getOrElse(t1) - t0) / 3600000L,
        if (fp.isDefined) 1L else 0L, coin("lr:", u))
    }.toSeq
    val (tot0, tot1) = (perUser.count(_._3 == 0L).toLong,
      perUser.count(_._3 == 1L).toLong)
    val byD = perUser.groupBy(_._1).toSeq.sortBy(_._1)
    var (rem0, rem1) = (tot0, tot1)
    var (o1, e1f, vf) = (0L, 0.0, 0.0)
    byD.foreach { case (_, rows) =>
      val e0 = rows.filter(_._3 == 0L).map(_._2).sum
      val e1 = rows.filter(_._3 == 1L).map(_._2).sum
      val dj = e0 + e1
      val nj = rem0 + rem1
      if (dj > 0) {
        o1 += e1
        e1f += dj.toDouble * rem1.toDouble / nj.toDouble
        if (nj > 1)
          vf += dj.toDouble * (rem1.toDouble / nj.toDouble) *
            (1.0 - rem1.toDouble / nj.toDouble) *
            ((nj.toDouble - dj.toDouble) / (nj.toDouble - 1.0))
      }
      rem0 -= rows.count(_._3 == 0L)
      rem1 -= rows.count(_._3 == 1L)
    }
    val z = (o1.toDouble - e1f) / math.sqrt(vf)
    val r = Survival.logrank(spark, sf).collect().head
    assert(r.getLong(0) == tot0 && r.getLong(1) == tot1, "group sizes")
    assert(r.getLong(2) == o1, "observed")
    assert(r.getDouble(3) == e1f && r.getDouble(4) == vf, "E and V")
    assert(r.getDouble(5) == z && r.getDouble(6) == z * z, "z and chi2")
  }

  test("stats_friedman equals a plain-Scala blocked-rank replay") {
    val daily = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select((unix_millis(col("ts")) / lit(86400000L)).cast("long"),
        col("event_type"), col("value")).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        math.round(r.getDouble(2) * 1000000.0)))
      .groupBy(_._1).map { case (key, v) => (key._1, key._2, v.map(_._2).sum) }
      .toSeq
    val k = daily.map(_._2).distinct.size
    val complete = daily.groupBy(_._1).filter(_._2.size == k)
    var r2sum = Map[String, Long]().withDefaultValue(0L)
    complete.values.foreach { block =>
      val counts = block.groupBy(_._3).map { case (t, l) => t -> l.size.toLong }
      val sorted = counts.keys.toSeq.sorted
      var cum = 0L
      val r2ByTot = sorted.map { t =>
        cum += counts(t); t -> (2L * cum - counts(t) + 1L)
      }.toMap
      block.foreach(b => r2sum += b._2 -> (r2sum(b._2) + r2ByTot(b._3)))
    }
    val n = complete.size.toLong
    val s4 = r2sum.values.map(v => BigInt(v) * BigInt(v)).sum.toDouble
    val chi2 = 12.0 / (n.toDouble * k.toDouble * (k.toDouble + 1.0)) *
      (s4 / 4.0) - 3.0 * n.toDouble * (k.toDouble + 1.0)
    val got = NonParam.friedman(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == r2sum.keys.toSeq.sorted)
    got.foreach { r =>
      assert(r.getLong(1) == r2sum(r.getString(0)), s"rank sum ${r.getString(0)}")
      assert(r.getLong(2) == n, "blocks")
      assert(r.getDouble(3) == chi2, "chi2")
      assert(r.getLong(4) == k.toLong - 1L, "df")
    }
  }

  test("stats_cochranq equals a plain-Scala integer chain") {
    val per = graft.Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (_, l) =>
        val ts = l.map(_._2).toSet
        (if (ts("click")) 1L else 0L, if (ts("view")) 1L else 0L,
          if (ts("purchase")) 1L else 0L)
      }.toSeq
    val (c1, c2, c3) = (per.map(_._1).sum, per.map(_._2).sum, per.map(_._3).sum)
    val rs = per.map(p => p._1 + p._2 + p._3)
    val nn = rs.sum
    val sumR2 = rs.map(r => r * r).sum
    val sumC2 = c1 * c1 + c2 * c2 + c3 * c3
    val den = 3L * nn - sumR2
    val r = NonParam.cochranQ(spark, sf).collect().head
    assert(r.getLong(0) == per.size.toLong, "users")
    assert(r.getLong(1) == c1 && r.getLong(2) == c2 && r.getLong(3) == c3,
      "column totals")
    assert(r.getLong(4) == nn && r.getLong(5) == sumR2, "row moments")
    // sf0.001 is degenerate by construction: every user emits all three
    // types, so den = 0 and Q is undefined — the NULL guard must fire
    if (den > 0) {
      val q = 2.0 * (3.0 * sumC2.toDouble - nn.toDouble * nn.toDouble) /
        den.toDouble
      assert(r.getDouble(6) == q, "Q")
    } else assert(r.isNullAt(6), "undefined Q must be NULL")
    assert(r.getLong(7) == 2L, "df")
    // a synthetic mixed corpus exercises the defined-Q chain end-to-end
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cq").toString
    Seq((1L, "click"), (1L, "view"), (2L, "click"), (3L, "purchase"),
      (3L, "view"), (4L, "click"), (4L, "purchase"))
      .toDF("user_id", "event_type")
      .withColumn("ts", lit("2020-01-01 00:00:00").cast("timestamp"))
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r2 = NonParam.cochranQ(spark, tmp).collect().head
    // rows: r = (2,1,2,2); C = (3,2,2); N=7; sumR2=13; den=8
    assert(r2.getLong(4) == 7L && r2.getLong(5) == 13L, "synthetic moments")
    assert(r2.getDouble(6) ==
      2.0 * (3.0 * 17.0 - 49.0) / 8.0, "synthetic Q")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("text_burstiness equals a plain-Scala VMR replay") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val d = docs.length.toLong
    val tokRe = "[a-z0-9]+".r
    val perDoc = docs.flatMap { case (id, t) =>
      tokRe.findAllIn(t.toLowerCase).map(tok => (tok, id))
    }.groupBy(identity).map { case ((tok, id), l) => (tok, id, l.size.toLong) }
    val perTerm = perDoc.groupBy(_._1).map { case (tok, l) =>
      (tok, l.map(_._3).sum, l.size.toLong,
        l.map(x => BigInt(x._3) * BigInt(x._3)).sum)
    }.toSeq.sortBy(t => (-t._2, t._1)).take(20)
    val got = TextOps.textBurstiness(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == perTerm.map(_._1))
    got.zip(perTerm).foreach { case (r, (tok, tot, nd, sc2)) =>
      assert(r.getLong(1) == tot && r.getLong(2) == nd, s"counts $tok")
      val mean = tot.toDouble / d.toDouble
      val variance = (sc2.toDouble - tot.toDouble * tot.toDouble / d.toDouble) /
        d.toDouble
      assert(r.getDouble(3) == mean, s"mean $tok")
      assert(r.getDouble(4) == variance / mean, s"vmr $tok")
    }
  }

  test("dq_tcloseness equals a plain-Scala exact-integer ordered EMD") {
    val rows = graft.Tables(spark, sf, "customer")
      .join(graft.Tables(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map { r =>
        val cents = math.round(r.getDouble(2) * 100.0)
        ((r.getString(0), r.getString(1)),
          math.floorDiv(cents + 400000L, 200000L))
      }
    val bands = rows.map(_._2).distinct.sorted
    val m = bands.size
    val nn = rows.length.toLong
    def cumThrough(counts: Map[Long, Long], b: Long): Long =
      bands.filter(_ <= b).map(counts.getOrElse(_, 0L)).sum
    val globCounts = rows.groupBy(_._2).map { case (b, l) => b -> l.size.toLong }
    val got = MlExtra.tCloseness(spark, sf).collect()
    val byQi = rows.groupBy(_._1)
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ==
      byQi.keys.toSeq.sorted)
    got.foreach { r =>
      val qi = (r.getString(0), r.getString(1))
      val grp = byQi(qi)
      val ng = grp.length.toLong
      val gc = grp.groupBy(_._2).map { case (b, l) => b -> l.size.toLong }
      val sSum = bands.map { b =>
        (BigInt(cumThrough(gc, b)) * nn - BigInt(cumThrough(globCounts, b)) * ng).abs
      }.sum
      val t = sSum.toDouble / (ng.toDouble * nn.toDouble * (m.toDouble - 1.0))
      assert(r.getLong(2) == ng, s"n $qi")
      assert(r.getDouble(3) == t, s"t $qi")
      assert(r.getInt(4) == (if (t > 0.2) 1 else 0), s"violates $qi")
    }
  }

  test("eval_winsorized equals a plain-Scala capped Welch chain") {
    val ev = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("value")).collect()
      .map(r => (coin("wins:", r.getLong(0)), math.round(r.getDouble(1) * 100.0)))
    val sorted = ev.map(_._2).sorted
    // pure-integer rank: k = (pct·(n−1)) div 100 + 1, 1-indexed
    def capAt(pct: Long): Long =
      sorted((pct * (sorted.length - 1L) / 100L).toInt)
    val (lo, hi) = (capAt(5L), capAt(95L))
    def arm(t: Long) = ev.filter(_._1 == t)
      .map(e => math.max(math.min(e._2, hi), lo))
    val (c, t) = (arm(0L), arm(1L))
    def mv(v: Array[Long]) = {
      val n = v.length.toDouble
      val s = v.map(BigInt(_)).sum.toDouble
      val ss = v.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      (s / n, (n * ss - s * s) / (n * (n - 1.0)))
    }
    val ((mc, vc), (mt, vt)) = (mv(c), mv(t))
    val se = math.sqrt(vc / c.length.toDouble + vt / t.length.toDouble)
    val r = Causal.evalWinsorized(spark, sf).collect().head
    assert(r.getLong(0) == c.length && r.getLong(1) == t.length, "arm sizes")
    assert(r.getLong(2) == lo && r.getLong(3) == hi, "caps")
    assert(r.getDouble(4) == mc && r.getDouble(5) == mt, "means")
    assert(r.getDouble(6) == mt - mc, "effect")
    assert(r.getDouble(7) == se && r.getDouble(8) == (mt - mc) / se, "se/z")
  }

  test("dq_outlier_iqr equals a plain-Scala Tukey-fence count") {
    val rows = graft.Tables(spark, sf, "customer")
      .select(col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100.0)))
    val got = FeatureQueries.dqOutlierIqr(spark, sf).collect()
    val byG = rows.groupBy(_._1)
    assert(got.map(_.getString(0)).toSeq == byG.keys.toSeq.sorted)
    got.foreach { r =>
      val vs = byG(r.getString(0)).map(_._2).sorted
      val n = vs.length.toLong
      def q(p: Long): Long = vs(((p * (n - 1)) / 100).toInt)
      val (q1, q3) = (q(25), q(75))
      val iqr = q3 - q1
      val low = vs.count(v => 2 * v < 2 * q1 - 3 * iqr).toLong
      val high = vs.count(v => 2 * v > 2 * q3 + 3 * iqr).toLong
      assert(r.getLong(1) == n, s"n ${r.getString(0)}")
      assert(r.getLong(2) == q1 && r.getLong(3) == q3 && r.getLong(4) == iqr,
        s"quartiles ${r.getString(0)}")
      assert(r.getLong(5) == low && r.getLong(6) == high,
        s"fence counts ${r.getString(0)}")
      assert(r.getDouble(7) == (low + high).toDouble / n.toDouble,
        s"rate ${r.getString(0)}")
    }
  }

  test("ml_lda equals a plain-Scala closed-form discriminant") {
    val rows = graft.Tables(spark, sf, "orders")
      .select(col("o_orderstatus"), col("o_totalprice"),
        expr("unix_millis(cast(o_orderdate as timestamp))"))
      .collect().map { r =>
        (if (r.getString(0) == "F") 1L else 0L,
          math.round(r.getDouble(1)), r.getLong(2) / 86400000L - 8035L)
      }
    def mom(y: Long) = {
      val g = rows.filter(_._1 == y)
      (g.size.toDouble,
        g.map(r => BigInt(r._2)).sum.toDouble,
        g.map(r => BigInt(r._3)).sum.toDouble,
        g.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble,
        g.map(r => BigInt(r._2) * BigInt(r._3)).sum.toDouble,
        g.map(r => BigInt(r._3) * BigInt(r._3)).sum.toDouble)
    }
    val (na, s1a, s2a, s11a, s12a, s22a) = mom(0L)
    val (nb, s1b, s2b, s11b, s12b, s22b) = mom(1L)
    val (mxa, mya, mxb, myb) = (s1a / na, s2a / na, s1b / nb, s2b / nb)
    val p11 = (s11a - s1a * s1a / na + (s11b - s1b * s1b / nb)) / (na + nb - 2.0)
    val p12 = (s12a - s1a * s2a / na + (s12b - s1b * s2b / nb)) / (na + nb - 2.0)
    val p22 = (s22a - s2a * s2a / na + (s22b - s2b * s2b / nb)) / (na + nb - 2.0)
    val (d1, d2) = (mxb - mxa, myb - mya)
    val det = p11 * p22 - p12 * p12
    val w1 = (p22 * d1 - p12 * d2) / det
    val w2 = (p11 * d2 - p12 * d1) / det
    val thr = (w1 * (mxa + mxb) + w2 * (mya + myb)) / 2.0
    var (tp, fp, tn, fn) = (0L, 0L, 0L, 0L)
    rows.foreach { case (y, x1, x2) =>
      val pred = w1 * x1.toDouble + w2 * x2.toDouble > thr
      if (pred && y == 1L) tp += 1 else if (pred) fp += 1
      else if (y == 0L) tn += 1 else fn += 1
    }
    val r = MlPlane.lda(spark, sf).collect().head
    assert(r.getLong(0) == na.toLong && r.getLong(1) == nb.toLong, "class sizes")
    assert(r.getDouble(2) == mxa && r.getDouble(3) == mya &&
      r.getDouble(4) == mxb && r.getDouble(5) == myb, "means")
    assert(r.getDouble(6) == w1 && r.getDouble(7) == w2 &&
      r.getDouble(8) == thr, "weights")
    assert(r.getLong(9) == tp && r.getLong(10) == fp &&
      r.getLong(11) == tn && r.getLong(12) == fn, "confusion")
    assert(r.getDouble(13) ==
      (tp + tn).toDouble / (tp + tn + fp + fn).toDouble, "accuracy")
  }
}
