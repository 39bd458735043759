package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7: generation-eval metrics certified against plain-Scala
  * replays (the DuckDB oracle runs in the driver gate).
  */
class LlmEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def toks(t: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq

  private def clipOverlap(r: Seq[String], h: Seq[String]): (Long, Long, Long) = {
    val cr = r.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ch = h.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ov = cr.iterator.map { case (g, c) => math.min(c, ch.getOrElse(g, 0L)) }.sum
    (r.size.toLong, h.size.toLong, ov)
  }

  private def f1(p: Double, r: Double): Double =
    if (p + r > 0) 2.0 * p * r / (p + r) else 0.0

  private lazy val docs: Map[Long, String] =
    graft.Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("eval_rouge equals a plain-Scala clipped-n-gram ROUGE replay") {
    val got = LlmEval.rouge(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val pid = row.getLong(0)
      val ref = toks(docs(pid)); val hyp = toks(docs(pid + 1))
      val (tr1, th1, ov1) = clipOverlap(ref, hyp)
      val p1 = if (th1 > 0) ov1.toDouble / th1 else 0.0
      val r1 = if (tr1 > 0) ov1.toDouble / tr1 else 0.0
      assert(row.getDouble(1) == p1 && row.getDouble(2) == r1, s"rouge1 @ $pid")
      assert(math.abs(row.getDouble(3) - f1(p1, r1)) < 1e-15, s"rouge1_f @ $pid")
      val big = (s: Seq[String]) => s.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val (tr2, th2, ov2) = clipOverlap(big(ref), big(hyp))
      val p2 = if (th2 > 0) ov2.toDouble / th2 else 0.0
      val r2 = if (tr2 > 0) ov2.toDouble / tr2 else 0.0
      assert(row.getDouble(4) == p2 && row.getDouble(5) == r2, s"rouge2 @ $pid")
      assert(math.abs(row.getDouble(6) - f1(p2, r2)) < 1e-15, s"rouge2_f @ $pid")
    }
  }

  test("eval_chrf equals a plain-Scala char-n-gram chrF replay") {
    val got = LlmEval.chrf(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val pid = row.getLong(0)
      def cs(id: Long) = docs(id).toLowerCase.filter(c => c.isDigit ||
        (c >= 'a' && c <= 'z'))
      val fs = (1 to 3).map { n =>
        val grams = (s: String) => s.sliding(n).filter(_.length == n).toSeq
        val (tr, th, ov) = clipOverlap(grams(cs(pid)), grams(cs(pid + 1)))
        val p = if (th > 0) ov.toDouble / th else 0.0
        val r = if (tr > 0) ov.toDouble / tr else 0.0
        if (p + r > 0) 5.0 * p * r / (4.0 * p + r) else 0.0
      }
      (1 to 3).foreach(n => assert(math.abs(row.getDouble(n) - fs(n - 1)) < 1e-15,
        s"chrf$n @ $pid"))
      assert(math.abs(row.getDouble(4) - (fs(0) + fs(1) + fs(2)) / 3.0) < 1e-15)
      // chrF is a [0,1] score
      assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
    }
  }

  test("eval_conformal: interval identity, rank selection, coverage bounds") {
    val got = LlmEval.conformal(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (mean, qhat, lo, hi) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(lo == mean - qhat && hi == mean + qhat)
      assert(qhat >= 0.0)
      val (nTest, nCov, cov) = (r.getLong(3), r.getLong(8), r.getDouble(9))
      assert(nCov >= 0 && nCov <= nTest)
      assert(cov == (if (nTest > 0) nCov.toDouble / nTest else 0.0))
    }
    // q̂ replay for one group: k-th smallest calibration |residual|
    val ev = graft.Tables(spark, dir, "events").filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cf:$id".getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val grp = got.head.getString(0)
    val rows = ev.filter(_._2 == grp)
    val train = rows.filter(t => bucket(t._1) <= 5)
    val mean = train.map(t => BigDecimal(t._3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / train.length
    val calScores = rows.filter(t => bucket(t._1) == 6 || bucket(t._1) == 7)
      .map(t => math.abs(t._3 - mean)).sorted
    val k = math.min((9 * (calScores.length + 1) + 9) / 10, calScores.length)
    assert(math.abs(got.head.getDouble(4) - mean) < 1e-9)
    assert(got.head.getDouble(5) == calScores(k - 1), "qhat is the k-th score")
  }
}
