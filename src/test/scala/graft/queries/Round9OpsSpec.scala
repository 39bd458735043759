package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-9 hardening fixtures: the degenerate corners the r8 advice
  * showed the sf-corpus oracle gate cannot reach — short-document
  * BLEU pairs (absent (pair, n) rows), tiny conformal calibration
  * groups (infinite interval), and label-propagation convergence
  * exactly on the iteration cap.
  */
class Round9OpsSpec extends SparkSpec {

  private val tmpDirs = scala.collection.mutable.ArrayBuffer[String]()

  override def afterAll(): Unit = {
    tmpDirs.foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    }
    super.afterAll()
  }

  private def tmpDir(suffix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"r9_$suffix").toString
    tmpDirs += d
    d
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("eval_bleu: pairs with docs shorter than n tokens get p_n = 1.0 (add-one), never 0") {
    val dir = tmpDir("bleu")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      // pair 0: both sides 2 tokens — n=3,4 rows ABSENT on both sides
      Row(0L, "alpha beta", "en", "s", 10L),
      Row(1L, "beta alpha", "en", "s", 10L),
      // pair 2: single-token identical docs — n=2..4 absent
      Row(2L, "x", "en", "s", 1L),
      Row(3L, "x", "en", "s", 1L),
      // pair 4: a normal-length pair (regression for the present-row path)
      Row(4L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      Row(5L, "the quick brown cat jumps over a lazy dog", "en", "s", 41L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val tokRx = "[a-z0-9]+".r
    val docs = rows.map(r => r.getLong(0) ->
      tokRx.findAllIn(r.getString(1).toLowerCase).toArray).toMap
    def grams(t: Array[String], n: Int): Seq[String] =
      if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq

    val got = LlmEval.bleu(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L))
    got.foreach { r =>
      val pid = r.getLong(0)
      val ref = docs(pid); val hyp = docs(pid + 1)
      val ps = (1 to 4).map { n =>
        val rg = grams(ref, n).groupBy(identity).view.mapValues(_.size).toMap
        val hg = grams(hyp, n).groupBy(identity).view.mapValues(_.size).toMap
        val ov = hg.map { case (g, ch) => math.min(ch, rg.getOrElse(g, 0)) }.sum
        val th = hg.values.sum
        (ov + 1).toDouble / (th + 1).toDouble
      }
      (0 until 4).foreach(i =>
        assert(r.getDouble(1 + i) == ps(i), s"pair $pid p${i + 1}"))
      assert(r.getDouble(8) ==
        math.sqrt(math.sqrt(ps(0) * ps(1) * ps(2) * ps(3))), s"pair $pid bleu")
    }
    // the specific regression: pair 2 (1-token docs) must be all-1.0
    val p2 = got.find(_.getLong(0) == 2L).get
    assert((1 to 4).forall(i => p2.getDouble(i) == 1.0))
    assert(p2.getDouble(8) == 1.0)
  }

  test("eval_conformal: n_cal < 9 emits NULL qhat/lo/hi (infinite interval) with coverage 1") {
    val dir = tmpDir("conf")
    // the query's split bucket, replicated: first 8 hex of md5("cf:"+id) mod 10
    def b(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"cf:$id").take(8), 16) % 10L
    val ids = (1L to 400L)
    def pick(pred: Long => Boolean, k: Int, from: Seq[Long]): Seq[Long] =
      from.filter(pred).take(k)
    // "rare": 3 calibration rows (k = ceil(0.9*4) = 4 > 3 → infinite)
    val rare = pick(i => b(i) <= 5, 6, ids) ++
      pick(i => b(i) == 6 || b(i) == 7, 3, ids) ++ pick(i => b(i) >= 8, 4, ids)
    // "common": 12 calibration rows (k = 12 ≤ 12 → finite q̂)
    val usedByRare = rare.toSet
    val rest = ids.filterNot(usedByRare)
    val common = pick(i => b(i) <= 5, 12, rest) ++
      pick(i => b(i) == 6 || b(i) == 7, 12, rest) ++ pick(i => b(i) >= 8, 6, rest)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def rowsOf(tp: String, is: Seq[Long]) =
      is.map(i => Row(i, t0, i % 7, tp, (i % 11).toDouble, "{}"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rowsOf("rare", rare) ++ rowsOf("common", common)),
      schema).coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/events.parquet")

    val got = LlmEval.conformal(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("rare", "common"))

    val r = got("rare")
    assert(r.getLong(2) == 3L, "rare n_cal")
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7),
      "rare qhat/lo/hi must be NULL (infinite interval)")
    assert(r.getLong(8) == r.getLong(3), "infinite interval covers all test points")
    assert(r.getDouble(9) == 1.0)

    // the finite path is untouched: replicate q̂ for "common" in plain Scala
    val c = got("common")
    assert(c.getLong(2) == 12L, "common n_cal")
    val trainVals = common.filter(i => b(i) <= 5).map(i => (i % 11).toDouble)
    val mean = trainVals.map(v => BigDecimal(v)).sum.toDouble / trainVals.size
    assert(c.getDouble(4) == mean, "mean_pred")
    val calScores = common.filter(i => b(i) == 6 || b(i) == 7)
      .map(i => (i, math.abs((i % 11).toDouble - mean))).sortBy(p => (p._2, p._1))
    val k = (9 * (12 + 1) + 9) / 10 // = 12
    val qhat = calScores(k - 1)._2
    assert(c.getDouble(5) == qhat, "qhat")
    assert(c.getDouble(6) == mean - qhat && c.getDouble(7) == mean + qhat)
  }

  private val sf = "/root/testdata/sf0.001"

  private def didTreat(uid: Long): Long =
    java.lang.Long.parseLong(md5hex(s"did:$uid").take(8), 16) % 2L

  test("eval_did equals a plain-Scala two-by-two cell-mean contrast") {
    val rows = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("value"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val d0 = rows.map(_._3 / 86400000L).min
    def cellVals(t: Long, post: Boolean) = rows.filter { case (u, _, ms) =>
      didTreat(u) == t && ((ms / 86400000L >= d0 + 15) == post)
    }.map(_._2)
    def mean(vs: Seq[Double]): Double =
      vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / vs.size
    val Seq(cp, cq, tp, tq) = Seq((0L, false), (0L, true), (1L, false), (1L, true))
      .map { case (t, post) => cellVals(t, post) }
    val r = Inference.evalDid(spark, sf).collect().head
    assert(r.getLong(0) == cp.size && r.getLong(1) == cq.size &&
      r.getLong(2) == tp.size && r.getLong(3) == tq.size)
    assert(r.getDouble(4) == mean(cp) && r.getDouble(5) == mean(cq))
    assert(r.getDouble(6) == mean(tp) && r.getDouble(7) == mean(tq))
    assert(r.getDouble(8) ==
      (mean(tq) - mean(tp)) - (mean(cq) - mean(cp)))
  }

  test("eval_srm equals plain-Scala per-user assignment counts") {
    val users = graft.Tables(spark, sf, "events")
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val nT = users.count(didTreat(_) == 1L).toLong
    val nC = users.length - nT
    val n = users.length.toDouble
    val r = Inference.evalSrm(spark, sf).collect().head
    assert(r.getLong(0) == nC && r.getLong(1) == nT)
    assert(r.getDouble(2) == (nT.toDouble - n / 2.0) / math.sqrt(n / 4.0))
    assert(r.getDouble(3) == ((nT - nC) * (nT - nC)).toDouble / n)
  }

  test("ml_boost_deep equals a plain-Scala 3-round stump sequence") {
    val li = graft.Tables(spark, sf, "lineitem")
      .select(round(col("l_extendedprice") * 100.0).cast("long"),
        col("l_quantity").cast("long"),
        round(col("l_discount") * 100.0).cast("long"),
        round(col("l_tax") * 100.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = li.length.toLong
    val f0 = Math.floorDiv(li.map(_._1).sum, n)
    var resid = li.map { case (y, q, d, t) => (q, d, t, y - f0) }

    final case class Best(t: Long, nl: Long, nr: Long, sl: Long, sr: Long,
      ll: Long, lr: Long, gain: Double)
    def stump(fv: ((Long, Long, Long, Long)) => Long): Best = {
      val hist = resid.groupBy(fv).map { case (t, rs) =>
        (t, rs.size.toLong, rs.map(_._4).sum)
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
      cands.minBy(b => (-b.gain, b.t))
    }

    val feats: Seq[((Long, Long, Long, Long)) => Long] =
      Seq(_._1, _._2, _._3)
    val expected = feats.map { fv =>
      val b = stump(fv)
      val before = resid.map(r => BigInt(r._4) * BigInt(r._4)).sum
      resid = resid.map { case (q, d, t, r) =>
        val leaf = if (fv((q, d, t, r)) <= b.t) b.ll else b.lr
        (q, d, t, r - leaf)
      }
      val after = resid.map(r => BigInt(r._4) * BigInt(r._4)).sum
      (b, before, after)
    }
    val got = MlExtra.boostDeep(spark, sf).orderBy(col("round")).collect()
    assert(got.length == 3)
    got.zip(expected).foreach { case (r, (b, before, after)) =>
      assert(r.getLong(2) == b.t && r.getLong(3) == b.nl && r.getLong(4) == b.nr)
      assert(r.getLong(5) == b.sl && r.getLong(6) == b.sr)
      assert(r.getLong(7) == b.ll && r.getLong(8) == b.lr)
      assert(r.getDouble(9) == b.gain)
      assert(r.getDouble(10) == before.toDouble)
      assert(r.getDouble(11) == after.toDouble)
      assert(r.getLong(12) == b.nl + b.nr)
    }
    assert(got.map(_.getString(1)).toSeq ==
      Seq("l_quantity", "l_discount", "l_tax"))
  }

  test("eval_power equals a plain-Scala moment/MDE chain") {
    val rows = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = Inference.evalPower(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getString(0)
      val g = rows.filter(_._1 == et)
      val nC = g.count(x => didTreat(x._3) == 0L).toLong
      val nT = g.size - nC
      val n = g.size.toDouble
      val sx = g.map(x => BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val sxx = g.map { x =>
        val d = BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        (d * d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val mean = sx / n
      val variance = (n * sxx - sx * sx) / (n * (n - 1.0))
      val sd = math.sqrt(variance)
      val mde = 2.801585 * sd * math.sqrt(1.0 / nC.toDouble + 1.0 / nT.toDouble)
      assert(r.getLong(1) == nC && r.getLong(2) == nT, s"$et arms")
      assert(r.getDouble(3) == mean && r.getDouble(4) == sd, s"$et moments")
      assert(r.getDouble(5) == mde && r.getDouble(6) == mde / mean, s"$et mde")
    }
  }

  test("eval_ece equals a plain-Scala holdout reliability fold") {
    val rows = graft.Tables(spark, sf, "orders")
      .select(round(col("o_totalprice") * 100.0).cast("long"),
        (col("o_orderstatus") === "F").cast("long"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pooled exact deciles via the value-histogram cumulative
    val hist = rows.groupBy(_._1).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val n = rows.size.toLong
    var cum = 0L
    val binOf = hist.map { case (v, c) => cum += c; v -> (cum - 1) * 10 / n }.toMap
    final case class B(var nTr: Long = 0, var pTr: Long = 0,
      var nTe: Long = 0, var pTe: Long = 0)
    val bins = scala.collection.mutable.Map[Long, B]()
    rows.foreach { case (v, y, k) =>
      val b = bins.getOrElseUpdate(binOf(v), B())
      if (k % 5 != 0) { b.nTr += 1; b.pTr += y } else { b.nTe += 1; b.pTe += y }
    }
    val ntAll = bins.values.map(_.nTe).sum.toDouble
    val ordered = bins.toSeq.sortBy(_._1)
    val ece = ordered.foldLeft(0.0) { case (acc, (_, b)) =>
      val gap = math.abs(b.pTr.toDouble / b.nTr.toDouble -
        b.pTe.toDouble / b.nTe.toDouble)
      acc + b.nTe.toDouble / ntAll * gap
    }
    val got = FeatureQueries.evalEce(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == ordered.map(_._1))
    got.zip(ordered).foreach { case (r, (_, b)) =>
      val conf = b.pTr.toDouble / b.nTr.toDouble
      val acc = b.pTe.toDouble / b.nTe.toDouble
      assert(r.getLong(1) == b.nTr && r.getLong(2) == b.pTr)
      assert(r.getLong(3) == b.nTe && r.getLong(4) == b.pTe)
      assert(r.getDouble(5) == conf && r.getDouble(6) == acc)
      assert(r.getDouble(7) == math.abs(conf - acc))
      assert(r.getDouble(8) == ece)
    }
  }

  test("Dedup.clusters converges on a path whose diameter equals maxIter exactly") {
    import spark.implicits._
    // path 1-2-3-...-6: min-label reaches node 6 after 5 propagation
    // rounds; the confirming no-change round is round 6 — with
    // maxIter = 5 the pre-fix loop threw despite correct labels
    val pairs = (1L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = graft.operators.Dedup.clusters(pairs, maxIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (1L to 6L).map(_ -> 1L).toMap)
  }
}
