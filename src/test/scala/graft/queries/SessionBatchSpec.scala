package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-6 continuation batch certified against independent
  * plain-Scala references (the DuckDB oracle runs in the driver
  * gate): Kaplan–Meier survival, DTW, the decision stump, Fisher's
  * exact test (vs exact BigInt hypergeometrics), WOE encoding, and
  * the Borůvka MSF (vs a plain-Scala Kruskal — different algorithm,
  * provably identical forest under the total edge order).
  */
class SessionBatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("survival_km equals a plain-Scala Kaplan-Meier + Nelson-Aalen replay") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = ev.groupBy(_._1).toSeq.map { case (_, g) =>
      val t0 = g.map(_._3).min
      val fp = g.filter(_._2 == "purchase").map(_._3).minOption
      val end = fp.getOrElse(g.map(_._3).max)
      ((end - t0) / 3600000L, fp.isDefined)
    }.toSeq
    val total = users.size.toLong
    val byD = users.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, g) => (d, g.size.toLong, g.count(_._2).toLong) }
    var rem = total; var prod = 1.0; var na = 0.0
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Double)]()
    byD.foreach { case (d, n, e) =>
      val ratio = e.toDouble / rem.toDouble
      prod *= (1.0 - ratio); na += ratio
      if (e > 0) want += ((d, rem, e, prod, na))
      rem -= n
    }
    val got = Survival.kaplanMeier(spark, dir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.zip(want).foreach { case (r, (d, risk, e, s0, h0)) =>
      assert(r.getLong(0) == d && r.getLong(1) == risk && r.getLong(2) == e)
      assert(math.abs(r.getDouble(3) - s0) < 1e-12, s"surv at $d")
      assert(math.abs(r.getDouble(4) - h0) < 1e-12, s"cumhaz at $d")
    }
    // survival is a monotone non-increasing step function in (0, 1]
    got.map(_.getDouble(3)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-15)
      case _ =>
    }
  }

  test("ts_dtw equals the classic O(n*m) DP and satisfies DTW bounds") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_type"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400000L))
    val d0 = ev.map(_._2).min; val d1 = ev.map(_._2).max
    val days = (d0 to d1).toArray
    val series = ev.groupBy(_._1).view.mapValues { g =>
      val c = g.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      days.map(d => c.getOrElse(d, 0L))
    }.toMap
    def dtw(a: Array[Long], b: Array[Long]): Long = {
      val inf = Long.MaxValue / 4
      var prev = Array.fill(b.length + 1)(inf); prev(0) = 0L
      for (i <- a.indices) {
        val cur = Array.fill(b.length + 1)(inf)
        for (j <- b.indices)
          cur(j + 1) = math.abs(a(i) - b(j)) +
            math.min(prev(j + 1), math.min(prev(j), cur(j)))
        prev = cur
      }
      prev(b.length)
    }
    val got = TimeSeriesQueries.tsDtw(spark, dir).collect()
    val types = series.keys.toSeq.sorted
    assert(got.length == types.combinations(2).size && got.nonEmpty)
    got.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val want = dtw(series(ta), series(tb))
      assert(r.getLong(3) == want, s"dtw($ta,$tb): got ${r.getLong(3)} want $want")
      // lower bound: |sum(a) - sum(b)| <= dtw (each unit of mass mismatch costs >= 1)
      assert(r.getLong(3) >= math.abs(series(ta).sum - series(tb).sum))
    }
  }

  test("ml_stump equals brute-force weighted Gini over all splits and flags the argmin") {
    val rows = graft.Tables(spark, dir, "lineitem")
      .select(col("l_quantity").cast("long"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), if (r.getString(1) == "R") 1L else 0L))
    val nn = rows.length.toLong
    val qs = rows.map(_._1).distinct.sorted
    def giniAt(t: Long): (Long, Long, Long, Long, Double) = {
      val (l, r) = rows.partition(_._1 <= t)
      val (nl, pl) = (l.length.toLong, l.map(_._2).sum)
      val (nr, pr) = (r.length.toLong, r.map(_._2).sum)
      def g(n: Long, p: Long) = {
        val f = p.toDouble / n.toDouble
        1.0 - f * f - (1.0 - f) * (1.0 - f)
      }
      (nl, pl, nr, pr,
        nl.toDouble / nn.toDouble * g(nl, pl) + nr.toDouble / nn.toDouble * g(nr, pr))
    }
    val cands = qs.init.map(t => t -> giniAt(t)).toMap
    val bestG = cands.values.map(_._5).min
    val bestT = cands.filter(_._2._5 == bestG).keys.min
    val got = FeatureQueries.mlStump(spark, dir).collect()
    assert(got.length == qs.length - 1)
    got.foreach { r =>
      val (nl, pl, nr, pr, g) = cands(r.getLong(0))
      assert(r.getLong(1) == nl && r.getLong(2) == pl &&
        r.getLong(3) == nr && r.getLong(4) == pr)
      assert(math.abs(r.getDouble(5) - g) < 1e-12)
      assert(r.getBoolean(6) == (r.getLong(0) == bestT), s"is_best at ${r.getLong(0)}")
    }
  }

  test("stats_fisher matches exact BigInt hypergeometric tail probabilities") {
    val custs = graft.Tables(spark, dir, "customer")
      .join(graft.Tables(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getString(0), r.getString(1) == "BUILDING",
        r.getDouble(2) > 5000.0))
    def choose(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product /
        (BigInt(1) to BigInt(k)).product
    val got = Inference.statsFisher(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val g = custs.filter(_._1 == r.getString(0))
      val nN = g.length.toLong; val kK = g.count(_._2).toLong
      val n1 = g.count(_._3).toLong; val a = g.count(c => c._2 && c._3).toLong
      assert(r.getLong(1) == nN && r.getLong(2) == kK &&
        r.getLong(3) == n1 && r.getLong(4) == a)
      // validity domain of the k=0-anchored recurrence holds on this data
      assert(n1 + kK <= nN, s"margins too large in ${r.getString(0)}")
      val denom = choose(nN, n1)
      val p = (a to math.min(n1, kK)).map(k =>
        BigDecimal(choose(kK, k) * choose(nN - kK, n1 - k)) / BigDecimal(denom))
        .sum.toDouble
      assert(math.abs(r.getDouble(5) - p) < 1e-10,
        s"${r.getString(0)}: got ${r.getDouble(5)} want $p")
    }
  }

  test("encode_woe matches a plain-Scala smoothed WOE/IV replay") {
    val os = graft.Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1) == "1-URGENT"))
    val cn = graft.Tables(spark, dir, "customer")
      .join(graft.Tables(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byNation = os.groupBy(o => cn(o._1))
    val tp = os.count(_._2).toLong; val tn = os.size.toLong - tp
    val got = FeatureQueries.encodeWoe(spark, dir).collect()
    assert(got.length == byNation.size && got.nonEmpty)
    got.foreach { r =>
      val g = byNation(r.getString(0))
      val pos = g.count(_._2).toLong; val neg = g.size.toLong - pos
      assert(r.getLong(1) == pos && r.getLong(2) == neg)
      val woe = BigDecimal(math.log(((pos + 0.5) * tn) / ((neg + 0.5) * tp)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - woe) <= 1e-4 + 1e-12, s"woe ${r.getString(0)}")
      val iv = (pos.toDouble / tp - neg.toDouble / tn) * r.getDouble(3)
      assert(math.abs(r.getDouble(4) - iv) <= 1e-4 + 1e-12, s"iv ${r.getString(0)}")
    }
  }

  test("graph_mst equals a plain-Scala Kruskal forest and spans every component") {
    val edges = Relational.graphBuild(spark, dir)
      .select(col("u"), col("v"), col("shared")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    val sorted = edges.sortBy(e => (-e._3, e._1, e._2))
    val kruskal = sorted.flatMap { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) None else { parent(ru) = rv; Some((u, v, w)) }
    }.sortBy(e => (e._1, e._2))
    val got = Relational.graphMst(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == kruskal.toSeq,
      s"Boruvka forest != Kruskal forest (${got.length} vs ${kruskal.length} edges)")
    // forest property: |E| = |V| - #components, acyclic by construction of both
    val comps = nodes.map(find).distinct.length
    assert(got.length == nodes.length - comps)
  }
}
