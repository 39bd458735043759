package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-6 additions certified against independent plain-Scala
  * references (the DuckDB oracle runs in the driver gate): the
  * Ljung–Box portmanteau Q and the referential-integrity audit.
  */
class Round6OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ts_ljungbox equals a plain-Scala Q over lags 1..5") {
    val byUser = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).map(_._3)).toMap
      .filter(_._2.length >= 12)
    val got = Inference.tsLjungbox(spark, dir).collect()
    assert(got.length == byUser.size && got.nonEmpty)
    got.foreach { r =>
      val vs = byUser(r.getLong(0))
      val n = vs.length
      assert(r.getLong(1) == n)
      val m = vs.sum / n
      val den = vs.map(v => (v - m) * (v - m)).sum
      def rho(k: Int) =
        (0 until n - k).map(i => (vs(i) - m) * (vs(i + k) - m)).sum / den
      val q = n.toDouble * (n + 2.0) *
        (1 to 5).map(k => { val r = rho(k); r * r / (n.toDouble - k) }).sum
      assert(math.abs(r.getDouble(2) - q) < 1e-9 * math.max(1.0, math.abs(q)),
        s"user ${r.getLong(0)}: got ${r.getDouble(2)} want $q")
    }
  }

  test("ts_holtwinters equals a plain-Scala additive Holt-Winters recursion") {
    val rows = graft.Tables(spark, dir, "events")
      .select(col("event_type"),
        (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .groupBy(col("event_type"), col("day")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (t, g) =>
      val byDay = g.map(e => e._2 -> e._3).toMap
      val (d0, d1) = (byDay.keys.min, byDay.keys.max)
      val vs = (d0 to d1).map(d => byDay.getOrElse(d, 0L).toDouble).toArray
      val lv0 = vs.take(7).foldLeft(0.0)(_ + _) / 7.0
      val se = Array.tabulate(7)(d => vs((((d - d0) % 7 + 7) % 7).toInt) - lv0)
      var (lv, tr) = (lv0, 0.0)
      (7 until vs.length).foreach { i =>
        val dw = ((d0 + i) % 7).toInt
        val v = vs(i)
        val lvN = 0.3 * (v - se(dw)) + 0.7 * (lv + tr)
        val trN = 0.1 * (lvN - lv) + 0.9 * tr
        val sN = 0.2 * (v - lvN) + 0.8 * se(dw)
        lv = lvN; tr = trN; se(dw) = sN
      }
      t -> (vs.length.toLong, lv, tr, lv + tr + se(((d1 + 1) % 7).toInt))
    }
    val got = TimeSeriesQueries.tsHoltwinters(spark, dir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, lv, tr, fc) = want(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == lv, s"${r.getString(0)} level")
      assert(r.getDouble(3) == tr, s"${r.getString(0)} trend")
      assert(r.getDouble(4) == fc, s"${r.getString(0)} forecast")
    }
  }

  test("dq_referential equals plain-Scala orphan counts and is all-clean on the fixture") {
    def keys(t: String, c: String): Array[Long] =
      graft.Tables(spark, dir, t).select(col(c).cast("long")).collect().map(_.getLong(0))
    val cases = Seq(
      ("customer->nation", keys("customer", "c_nationkey"), keys("nation", "n_nationkey")),
      ("lineitem->orders", keys("lineitem", "l_orderkey"), keys("orders", "o_orderkey")),
      ("lineitem->part", keys("lineitem", "l_partkey"), keys("part", "p_partkey")),
      ("lineitem->supplier", keys("lineitem", "l_suppkey"), keys("supplier", "s_suppkey")),
      ("orders->customer", keys("orders", "o_custkey"), keys("customer", "c_custkey")))
    val rows = FeatureQueries.dqReferential(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == cases.map(_._1))
    rows.zip(cases).foreach { case (r, (name, child, parent)) =>
      val pset = parent.toSet
      assert(r.getLong(1) == child.length, s"$name child_rows")
      assert(r.getLong(2) == child.distinct.length, s"$name distinct_keys")
      assert(r.getLong(3) == child.count(k => !pset.contains(k)), s"$name orphans")
    }
    assert(rows.forall(_.getLong(3) == 0L), "driver fixture has clean FKs")
  }
}
