package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 additions certified against independent plain-Scala
  * references at sf0.001 (the DuckDB oracle runs in the driver gate).
  * Doubles are compared EXACTLY where the query's IEEE chain is
  * replayed op-for-op — the house determinism bar.
  */
class Round8OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def coord(salt: String, key: Long): Long =
    java.lang.Long.parseLong(md5hex(salt + key).take(8), 16) % 1000000L

  test("ml_kmeans equals a plain-Scala 3-round Lloyd run") {
    val cids = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val pts = cids.map(c => (c, coord("kx:", c), coord("ky:", c)))
    var cents = pts.sortBy(_._1).take(4).zipWithIndex
      .map { case ((_, x, y), k) => (k.toLong, x.toDouble, y.toDouble) }
    var assigned: Array[(Long, Long, Long, Long)] = null
    (1 to 3).foreach { _ =>
      assigned = pts.map { case (c, x, y) =>
        val (xd, yd) = (x.toDouble, y.toDouble)
        val best = cents.map { case (k, cx, cy) =>
          ((xd - cx) * (xd - cx) + (yd - cy) * (yd - cy), k)
        }.min
        (c, x, y, best._2)
      }
      cents = assigned.groupBy(_._4).toArray.sortBy(_._1).map { case (k, g) =>
        val n = g.length.toDouble
        (k, g.map(e => BigInt(e._2)).sum.toDouble / n,
          g.map(e => BigInt(e._3)).sum.toDouble / n)
      }
    }
    val want = assigned.groupBy(_._4).map { case (k, g) =>
      val nd = g.length.toDouble
      val sx = g.map(e => BigInt(e._2)).sum.toDouble
      val sy = g.map(e => BigInt(e._3)).sum.toDouble
      val sxx = g.map(e => BigInt(e._2) * BigInt(e._2)).sum.toDouble
      val syy = g.map(e => BigInt(e._3) * BigInt(e._3)).sum.toDouble
      k -> (g.length.toLong, sx / nd, sy / nd,
        sxx - sx * sx / nd, syy - sy * sy / nd)
    }
    val got = MlPlane.kmeans(spark, dir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, cx, cy, wx, wy) = want(r.getLong(0))
      assert(r.getLong(1) == n, s"k=${r.getLong(0)} n")
      assert(r.getDouble(2) == cx && r.getDouble(3) == cy, s"k=${r.getLong(0)} centroid")
      assert(r.getDouble(4) == wx && r.getDouble(5) == wy, s"k=${r.getLong(0)} wcss")
    }
  }

  test("ml_pca equals the closed-form 2x2 eigen decomposition") {
    val spend = graft.Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uv = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey"), round(col("c_acctbal") * 100.0).cast("long"))
      .collect().map(r => (r.getLong(1), spend.getOrElse(r.getLong(0), 0L)))
    val nd = uv.length.toDouble
    val su = uv.map(e => BigInt(e._1)).sum.toDouble
    val sv = uv.map(e => BigInt(e._2)).sum.toDouble
    val suu = uv.map(e => BigInt(e._1) * BigInt(e._1)).sum.toDouble
    val suv = uv.map(e => BigInt(e._1) * BigInt(e._2)).sum.toDouble
    val svv = uv.map(e => BigInt(e._2) * BigInt(e._2)).sum.toDouble
    val a = (suu - su * su / nd) / (nd - 1.0)
    val b = (suv - su * sv / nd) / (nd - 1.0)
    val c = (svv - sv * sv / nd) / (nd - 1.0)
    val r0 = math.sqrt((a - c) / 2.0 * ((a - c) / 2.0) + b * b)
    val (l1, l2) = ((a + c) / 2.0 + r0, (a + c) / 2.0 - r0)
    val row = MlPlane.pca(spark, dir).collect().head
    assert(row.getLong(0) == uv.length)
    assert(row.getDouble(1) == a && row.getDouble(2) == b && row.getDouble(3) == c)
    assert(row.getDouble(4) == l1 && row.getDouble(5) == l2)
    assert(row.getDouble(6) == l1 / (a + c))
    assert(row.getDouble(7) == b && row.getDouble(8) == l1 - a)
  }

  test("ml_ridge lambda=0 equals OLS and coefficients shrink with lambda") {
    val rows = MlPlane.ridge(spark, dir).collect()
    assert(rows.length == 3)
    val byLam = rows.map(r => r.getDouble(0) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // plain-Scala Cramer replay at lambda = 0
    val items = graft.Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("x1"))
    val j = graft.Tables(spark, dir, "orders")
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .join(graft.Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(round(col("o_totalprice") * 100.0).cast("long"),
        col("x1"), round(col("c_acctbal") * 100.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = j.length.toDouble
    def bsum(f: ((Long, Long, Long)) => BigInt) = j.map(f).sum.toDouble
    val s1 = bsum(e => BigInt(e._2)); val s2 = bsum(e => BigInt(e._3))
    val sy = bsum(e => BigInt(e._1))
    val s11 = bsum(e => BigInt(e._2) * BigInt(e._2))
    val s12 = bsum(e => BigInt(e._2) * BigInt(e._3))
    val s22 = bsum(e => BigInt(e._3) * BigInt(e._3))
    val s1y = bsum(e => BigInt(e._2) * BigInt(e._1))
    val s2y = bsum(e => BigInt(e._3) * BigInt(e._1))
    def solve(lam: Double) = {
      val (q11, q22) = (s11 + lam, s22 + lam)
      val det = n * (q11 * q22 - s12 * s12) - s1 * (s1 * q22 - s12 * s2) +
        s2 * (s1 * s12 - q11 * s2)
      ((sy * (q11 * q22 - s12 * s12) - s1 * (s1y * q22 - s12 * s2y) +
        s2 * (s1y * s12 - q11 * s2y)) / det,
        (n * (s1y * q22 - s12 * s2y) - sy * (s1 * q22 - s12 * s2) +
          s2 * (s1 * s2y - s1y * s2)) / det,
        (n * (q11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
          sy * (s1 * s12 - q11 * s2)) / det)
    }
    Seq(0.0, 1.0e8, 1.0e12).foreach { lam =>
      val (b0, b1, b2) = solve(lam)
      val got = byLam(lam)
      assert(got._1 == b0 && got._2 == b1 && got._3 == b2, s"lambda=$lam")
    }
    // ridge shrinks the slope coefficients toward zero
    assert(math.abs(byLam(1.0e12)._2) < math.abs(byLam(0.0)._2))
  }

  test("dq_mahalanobis flags exactly the plain-Scala d2 > 12 set") {
    val items = graft.Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y2"))
    val base = graft.Tables(spark, dir, "orders")
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100.0).cast("long"), col("y2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = base.groupBy(_._2).flatMap { case (_, g) =>
      val nd = g.length.toDouble
      val s1 = g.map(e => BigInt(e._3)).sum.toDouble
      val s2 = g.map(e => BigInt(e._4)).sum.toDouble
      val s11 = g.map(e => BigInt(e._3) * BigInt(e._3)).sum.toDouble
      val s12 = g.map(e => BigInt(e._3) * BigInt(e._4)).sum.toDouble
      val s22 = g.map(e => BigInt(e._4) * BigInt(e._4)).sum.toDouble
      val (mu1, mu2) = (s1 / nd, s2 / nd)
      val c11 = s11 / nd - mu1 * mu1
      val c12 = s12 / nd - mu1 * mu2
      val c22 = s22 / nd - mu2 * mu2
      val det = c11 * c22 - c12 * c12
      if (det <= 0.0) Seq.empty[(Long, Double)] else g.toSeq.flatMap { e =>
        val dx = e._3.toDouble - mu1; val dy = e._4.toDouble - mu2
        val d2 = (dx * dx * c22 - 2.0 * dx * dy * c12 + dy * dy * c11) / det
        if (d2 > 12.0) Some(e._1 -> d2) else None
      }
    }
    val got = MlPlane.mahalanobis(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got == want.toMap)
  }

  test("stats_mcnemar equals plain-Scala paired contingency counting") {
    val rows = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("date").cast("string"),
        hour(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    val per = rows.groupBy(e => (e._1, e._2)).toSeq.map { case (_, g) =>
      (g.exists(e => e._3 < 12 && e._4 == "click"),
        g.exists(e => e._3 >= 12 && e._4 == "click"))
    }
    val b = per.count(p => p._1 && !p._2).toLong
    val c = per.count(p => !p._1 && p._2).toLong
    val r = NonParam.mcnemar(spark, dir).collect().head
    assert(r.getLong(0) == per.size && r.getLong(1) == per.count(p => p._1 && p._2))
    assert(r.getLong(2) == b && r.getLong(3) == c)
    assert(r.getDouble(4) == ((b - c) * (b - c)).toDouble / (b + c).toDouble)
    val ad = math.abs(b - c) - 1
    assert(r.getDouble(5) == (ad * ad).toDouble / (b + c).toDouble)
  }

  test("stats_cvm equals the plain-Scala exact ECDF cross-term sum") {
    val vs = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isin("click", "view"))
      .select(col("value"), col("event_type"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    val n = vs.count(_._2 == "click").toLong
    val m = vs.count(_._2 == "view").toLong
    val byV = vs.groupBy(_._1).toSeq.sortBy(_._1)
    var (a, bb) = (0L, 0L)
    var s = BigInt(0)
    byV.foreach { case (_, g) =>
      val cx = g.count(_._2 == "click").toLong
      val cy = g.count(_._2 == "view").toLong
      a += cx; bb += cy
      val diff = BigInt(a * m - bb * n)
      s += diff * diff * BigInt(cx + cy)
    }
    val t = s.toDouble / (n.toDouble * m.toDouble * (n.toDouble + m.toDouble) *
      (n.toDouble + m.toDouble))
    val r = NonParam.cvm(spark, dir).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == m)
    assert(r.getDouble(2) == s.toDouble && r.getDouble(3) == t)
  }

  test("stats_permtest equals a plain-Scala md5 permutation replay") {
    val base = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "purchase") && col("event_id") % 3 === 0)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 1000000.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val na = base.count(_._2 == "click").toLong
    val nb = base.count(_._2 == "purchase").toLong
    val obs = base.filter(_._2 == "click").map(e => BigInt(e._3)).sum.toDouble / na -
      base.filter(_._2 == "purchase").map(e => BigInt(e._3)).sum.toDouble / nb
    val stats = (1 to 200).flatMap { p =>
      val sides = base.map(e =>
        (java.lang.Long.parseLong(md5hex(s"pt:$p:${e._1}").take(8), 16) % 2, e._3))
      val g0 = sides.filter(_._1 == 0L); val g1 = sides.filter(_._1 == 1L)
      if (g0.isEmpty || g1.isEmpty) None
      else Some(g0.map(e => BigInt(e._2)).sum.toDouble / g0.length -
        g1.map(e => BigInt(e._2)).sum.toDouble / g1.length)
    }
    val nGe = stats.count(st => math.abs(st) >= math.abs(obs)).toLong
    val r = NonParam.permtest(spark, dir).collect().head
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getDouble(2) == obs)
    assert(r.getLong(3) == stats.length.toLong && r.getLong(4) == nGe)
    assert(r.getDouble(5) == (1.0 + nGe) / (1.0 + stats.length))
  }

  test("ts_drawdown equals a plain-Scala running-peak scan") {
    val daily = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(round(col("value") * 1000000.0).cast("long")).as("dv"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (t, g) =>
      val srt = g.sortBy(_._2.toString)
      var pk = Long.MinValue
      val scan = srt.map { e => pk = math.max(pk, e._3); (e._2, e._3, pk, pk - e._3) }
      val best = scan.minBy(e => (-e._4, e._1.toString))
      t -> (srt.length.toLong, best._4, best._1, best._3, best._2,
        best._4.toDouble / best._3.toDouble)
    }
    val got = TsExtra.drawdown(spark, dir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (nd, mdd, day, pk, lv, fr) = want(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == mdd)
      assert(r.getDate(3).toString == day.toString)
      assert(r.getLong(4) == pk && r.getLong(5) == lv)
      assert(r.getDouble(6) == fr)
    }
  }

  test("ts_rsi equals a plain-Scala Wilder recursion") {
    val closes = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(max(struct(col("ts"), col("event_id"),
        round(col("value") * 1000000.0).cast("long").as("m")))
        .getField("m").as("close"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val want = closes.groupBy(_._1).flatMap { case (t, g) =>
      val srt = g.sortBy(_._2).map(_._3)
      val diffs = srt.sliding(2).map(p => p(1) - p(0)).toArray
      if (diffs.length < 14) None else {
        var gl = (diffs.take(14).map(d => math.max(d, 0L)).sum.toDouble / 14.0,
          diffs.take(14).map(d => math.max(-d, 0L)).sum.toDouble / 14.0)
        diffs.drop(14).foreach { d =>
          gl = ((gl._1 * 13.0 + math.max(d, 0L).toDouble) / 14.0,
            (gl._2 * 13.0 + math.max(-d, 0L).toDouble) / 14.0)
        }
        val rsi = if (gl._2 == 0.0) 100.0
          else 100.0 - 100.0 / (1.0 + gl._1 / gl._2)
        Some(t -> (diffs.length.toLong, gl._1, gl._2, rsi))
      }
    }
    val got = TsExtra.rsi(spark, dir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (nd, g, l, rsi) = want(r.getString(0))
      assert(r.getLong(1) == nd)
      assert(r.getDouble(2) == g && r.getDouble(3) == l)
      assert(r.getDouble(4) == rsi)
    }
  }

  test("hier_rollup and hier_depth equal plain-Scala subtree/level sums") {
    val parts = graft.Tables(spark, dir, "part")
      .filter(col("p_partkey") >= 1)
      .select(col("p_partkey"), round(col("p_retailprice") * 100.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def depth(p: Long): Int = java.lang.Long.toBinaryString(p).length - 1
    val want = parts.flatMap { case (p, c) =>
      Iterator.iterate(p)(_ / 2).takeWhile(_ >= 1).filter(_ <= 127).map(a => (a, c))
    }.groupBy(_._1).map { case (node, g) =>
      node -> (g.length.toLong, g.map(_._2).sum)
    }
    val got = Hierarchy.rollup(spark, dir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, cents) = want(r.getLong(0))
      assert(r.getInt(1) == depth(r.getLong(0)))
      assert(r.getLong(2) == n && r.getLong(3) == cents, s"node ${r.getLong(0)}")
    }
    val wantD = parts.groupBy(e => depth(e._1)).map { case (d, g) =>
      d -> (g.length.toLong, g.map(_._2).sum, g.map(_._1).min, g.map(_._1).max)
    }
    val gotD = Hierarchy.depthProfile(spark, dir).collect()
    assert(gotD.length == wantD.size)
    gotD.foreach { r =>
      val (n, cents, lo, hi) = wantD(r.getInt(0))
      assert(r.getLong(1) == n && r.getLong(2) == cents)
      assert(r.getLong(3) == lo && r.getLong(4) == hi)
    }
  }

  test("text_kneser_ney equals plain-Scala interpolated KN at d=0.75") {
    val tokRx = "[a-z0-9]+".r
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("text")).collect().map(r =>
        tokRx.findAllIn(Option(r.getString(0)).getOrElse("").toLowerCase).toArray)
    val bgs = docs.flatMap(t => t.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val cbg = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = cbg.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nsucc = cbg.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nprec = cbg.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val ntypes = cbg.size.toLong
    val got = LmExtras.kneserNey(spark, dir).collect()
    val wantKeys = cbg.filter(_._2 >= 30).keySet
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == wantKeys)
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val c = cbg(key)
      val pkn = math.max(c.toDouble - 0.75, 0.0) / c1(key._1).toDouble +
        (0.75 * nsucc(key._1).toDouble / c1(key._1).toDouble) *
          (nprec(key._2).toDouble / ntypes.toDouble)
      assert(r.getLong(2) == c && r.getLong(3) == c1(key._1))
      assert(r.getLong(4) == nsucc(key._1) && r.getLong(5) == nprec(key._2))
      assert(r.getLong(6) == ntypes)
      assert(r.getDouble(7) == pkn, s"bigram $key")
    }
  }

  test("eval_bleu equals plain-Scala clipped n-gram precisions") {
    val tokRx = "[a-z0-9]+".r
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        tokRx.findAllIn(Option(r.getString(1)).getOrElse("").toLowerCase).toArray)
      .toMap
    def grams(t: Array[String], n: Int): Seq[String] =
      if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
    val got = LlmEval.bleu(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val pid = r.getLong(0)
      val ref = docs.getOrElse(pid, Array.empty[String])
      val hyp = docs.getOrElse(pid + 1, Array.empty[String])
      val ps = (1 to 4).map { n =>
        val rg = grams(ref, n).groupBy(identity).view.mapValues(_.size).toMap
        val hg = grams(hyp, n).groupBy(identity).view.mapValues(_.size).toMap
        val ov = hg.map { case (g, ch) => math.min(ch, rg.getOrElse(g, 0)) }.sum
        val th = hg.values.sum
        (ov + 1).toDouble / (th + 1).toDouble
      }
      (0 until 4).foreach(i =>
        assert(r.getDouble(1 + i) == ps(i), s"pair $pid p${i + 1}"))
      assert(r.getLong(5) == hyp.length.toLong && r.getLong(6) == ref.length.toLong)
      assert(r.getDouble(8) ==
        math.sqrt(math.sqrt(ps(0) * ps(1) * ps(2) * ps(3))), s"pair $pid bleu")
    }
  }
}
