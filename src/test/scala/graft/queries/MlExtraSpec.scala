package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7: naive Bayes, boosted stumps and l-diversity certified
  * against plain-Scala replays on sf0.001.
  */
class MlExtraSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ml_naivebayes equals a plain-Scala multinomial NB replay") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = "[a-z0-9]+".r.findAllIn(t.toLowerCase).take(10).toSeq
    val train = docs.filter(_._1 % 5 != 0)
    val test = docs.filter(_._1 % 5 == 0)
    val ctab = train.flatMap(d => toks(d._3).map((d._2, _)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tots = ctab.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val vsz = ctab.keys.map(_._2).toSet.size.toLong
    val priors = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val classes = priors.keys.toSeq.sorted
    val got = MlExtra.naiveBayes(spark, dir).collect()
    assert(got.length == test.length && got.nonEmpty)
    val byId = test.map(d => d._1 -> d).toMap
    got.foreach { r =>
      val (id, trueLang) = (r.getLong(0), r.getString(1))
      val d = byId(id)
      assert(trueLang == d._2)
      val scores = classes.map { c =>
        var s = priors(c).toDouble / train.length.toDouble
        toks(d._3).foreach { t =>
          s *= (ctab.getOrElse((c, t), 0L) + 1L).toDouble / (tots(c) + vsz).toDouble
        }
        (c, s)
      }
      val (bestC, bestS) = scores.minBy { case (c, s) => (-s, c) }
      assert(r.getString(2) == bestC, s"pred @ $id")
      assert(r.getDouble(3) == bestS, s"score @ $id")
      assert(r.getInt(4) == (if (bestC == trueLang) 1 else 0))
    }
  }

  test("ml_boost equals a plain-Scala two-round boosting replay") {
    val rows = graft.Tables(spark, dir, "lineitem")
      .select(col("l_extendedprice"), col("l_quantity"), col("l_discount"))
      .collect()
      .map(r => (math.round(r.getDouble(0) * 100.0),
        r.getDouble(1).toLong, math.round(r.getDouble(2) * 100.0)))
    val n = rows.length.toLong
    val f0 = Math.floorDiv(rows.map(_._1).sum, n)
    def tdiv(a: Long, b: Long): Long = a / b // JVM / truncates, as DuckDB //
    def stump(xs: Seq[(Long, Long)]): (Long, Long, Long, Long, Long, Long, Long, Double) = {
      val hist = xs.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (t, g) => (t, g.size.toLong, g.map(_._2).sum) }
      val nn = hist.map(_._2).sum; val ss = hist.map(_._3).sum
      var nl = 0L; var sl = 0L
      val cands = hist.flatMap { case (t, cn, cs) =>
        nl += cn; sl += cs
        val nr = nn - nl; val sr = ss - sl
        if (nr > 0)
          Some((t, nl, nr, sl, sr,
            sl.toDouble * sl.toDouble / nl.toDouble +
              sr.toDouble * sr.toDouble / nr.toDouble))
        else None
      }
      val best = cands.minBy { case (t, _, _, _, _, g) => (-g, t) }
      (best._1, best._2, best._3, best._4, best._5,
        tdiv(best._4, best._2), tdiv(best._5, best._3), best._6)
    }
    val r1 = rows.map { case (y, q, d) => (q, d, y - f0) }
    val b1 = stump(r1.map(t => (t._1, t._3)).toSeq)
    val r2 = r1.map { case (q, d, r) =>
      (d, r, r - (if (q <= b1._1) b1._6 else b1._7))
    }
    val b2 = stump(r2.map(t => (t._1, t._3)).toSeq)
    val r3 = r2.map { case (d, _, r2v) =>
      (r2v, r2v - (if (d <= b2._1) b2._6 else b2._7))
    }
    val got = MlExtra.boost(spark, dir).collect().sortBy(_.getLong(0))
    assert(got.length == 2)
    val g1 = got(0); val g2 = got(1)
    assert(g1.getLong(2) == b1._1 && g1.getLong(3) == b1._2 &&
      g1.getLong(4) == b1._3, "round-1 split")
    assert(g1.getLong(7) == b1._6 && g1.getLong(8) == b1._7, "round-1 leaves")
    assert(g1.getDouble(9) == b1._8, "round-1 gain")
    assert(g2.getLong(2) == b2._1 && g2.getLong(7) == b2._6 &&
      g2.getLong(8) == b2._7, "round-2")
    // SSE strictly decreases through both rounds
    val sse1 = BigInt(r1.map(t => BigInt(t._3) * BigInt(t._3)).sum.toString)
    val sse2 = r2.map(t => BigInt(t._3) * BigInt(t._3)).sum
    val sse3 = r3.map(t => BigInt(t._2) * BigInt(t._2)).sum
    // output sse columns are DOUBLE (exact-DECIMAL internal math cast
    // once in the final select — the no-DECIMAL-output rule)
    assert(g1.getDouble(10) == sse1.toDouble)
    assert(g1.getDouble(11) == sse2.toDouble)
    assert(g2.getDouble(10) == sse2.toDouble)
    assert(g2.getDouble(11) == sse3.toDouble)
    assert(sse2 < sse1 && sse3 < sse2)
  }

  test("dq_ldiversity equals a direct recount and flags 1-diverse classes") {
    val got = MlExtra.lDiversity(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(2))
      assert(r.getInt(4) == (if (r.getLong(3) < 3) 1 else 0))
    }
    // recount one group directly
    val g0 = got.head
    val cnt = graft.Tables(spark, dir, "customer")
      .join(graft.Tables(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === g0.getString(0) &&
        col("c_mktsegment") === g0.getString(1))
      .select(round(col("c_acctbal") * 100.0).cast("long").as("c"))
      .collect().map(r => Math.floorDiv(r.getLong(0) + 400000L, 200000L))
    assert(cnt.length.toLong == g0.getLong(2))
    assert(cnt.distinct.length.toLong == g0.getLong(3))
  }
}
