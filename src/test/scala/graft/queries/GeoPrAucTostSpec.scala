package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 milestone 5: the spatial grid join proven complete against
  * a brute-force all-pairs ground truth, scaled-integer AP replay,
  * and the TOST identity checks.
  */
class GeoPrAucTostSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5mod(salt: String, key: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$key".getBytes("UTF-8"))
    java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 1000000L
  }

  test("geo_grid_join equals brute-force all-pairs within radius") {
    val custs = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .map(k => (k, md5mod("gx:", k), md5mod("gy:", k)))
    val supps = graft.Tables(spark, dir, "supplier")
      .select(col("s_suppkey")).collect().map(_.getLong(0))
      .map(k => (k, md5mod("gx:", k + 7000000L), md5mod("gy:", k + 7000000L)))
    val r2 = 20000L * 20000L
    val want = custs.flatMap { case (cid, cx, cy) =>
      val within = supps.flatMap { case (sid, sx, sy) =>
        val d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
        if (d2 <= r2) Some((d2, sid)) else None
      }
      if (within.isEmpty) None
      else Some((cid, within.length.toLong, within.min))
    }.sortBy(_._1)
    val got = Geo.gridJoin(spark, dir).collect()
    assert(got.length == want.length,
      s"grid join found ${got.length} customers, brute force ${want.length}")
    got.zip(want).foreach { case (r, (cid, n, (d2, sid))) =>
      assert(r.getLong(0) == cid && r.getLong(1) == n)
      assert(r.getLong(2) == d2 && r.getLong(3) == sid, s"nearest @ $cid")
    }
  }

  test("eval_pr_auc equals a plain-Scala scaled-integer AP replay") {
    val rows = graft.Tables(spark, dir, "orders")
      .select(col("o_totalprice"), col("o_orderstatus")).collect()
      .map(r => (-math.round(r.getDouble(0) * 100.0), // desc via negation
        if (r.getString(1) == "F") 1L else 0L))
    val per = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, g.size.toLong, g.map(_._2).sum) }
    var nn = 0L; var tp = 0L; var apMicro = 0L
    per.foreach { case (_, c, pos) =>
      nn += c; tp += pos
      apMicro += pos * ((tp * 1000000L) / nn)
    }
    val npos = per.map(_._3).sum
    val r = MlExtra.prAuc(spark, dir).collect().head
    assert(r.getLong(0) == rows.length.toLong && r.getLong(1) == npos)
    assert(r.getLong(2) == apMicro, "ap_micro")
    assert(r.getDouble(3) == apMicro.toDouble / (npos * 1000000L).toDouble)
    // AP of a near-random score on a prevalent class ≈ prevalence; and
    // AP is always within (0, 1]
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("stats_tost: z identities and decision consistency") {
    val r = Inference.statsTost(spark, dir).collect().head
    val (diff, se, zl, zh) =
      (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(se > 0.0)
    assert(zl == (diff + 1.0) / se && zh == (1.0 - diff) / se)
    // the two one-sided stats straddle the margin: zl + zh = 2/se
    assert(math.abs((zl + zh) - 2.0 / se) < 1e-9)
    val eq = r.getInt(8)
    assert(eq == (if (zl > 1.645 && zh > 1.645) 1 else 0))
    // diff must lie inside (−1, 1) whenever declared equivalent
    if (eq == 1) assert(math.abs(diff) < 1.0)
  }
}
