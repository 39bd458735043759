package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** stats_prop_ztest / eval_cuped certified against independent
  * plain-Scala references (the DuckDB oracle runs in the driver gate).
  */
class ExperimentationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stats_prop_ztest equals a plain-Scala two-proportion z") {
    val evs = graft.Tables(spark, dir, "events")
      .select(col("event_type"),
        (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def wk(day: Long) = { val d = (day + 4) % 7; d == 0 || d == 6 }
    val nA = evs.count(e => wk(e._2)).toLong
    val xA = evs.count(e => wk(e._2) && e._1 == "error").toLong
    val nB = evs.count(e => !wk(e._2)).toLong
    val xB = evs.count(e => !wk(e._2) && e._1 == "error").toLong
    val (pa, pb) = (xA.toDouble / nA, xB.toDouble / nB)
    val p = (xA + xB).toDouble / (nA + nB)
    val z = (pa - pb) / math.sqrt(p * (1.0 - p) * (1.0 / nA + 1.0 / nB))
    val r = Inference.statsPropZtest(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((nA, xA, nB, xB)))
    assert(r.getDouble(4) == pa && r.getDouble(5) == pb)
    assert(math.abs(r.getDouble(6) - z) < 1e-12, s"z ${r.getDouble(6)} vs $z")
  }

  test("eval_cuped equals plain-Scala moments and reduces variance on correlated users") {
    val evs = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("value"),
        (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val d0 = evs.map(_._3).min
    // exact cents so sums match the DECIMAL(38,2) path
    val per = evs.groupBy(_._1).map { case (_, g) =>
      val x = g.filter(_._3 < d0 + 15).map(e => math.round(e._2 * 100)).sum
      val y = g.filter(_._3 >= d0 + 15).map(e => math.round(e._2 * 100)).sum
      (x, y)
    }.toSeq
    val n = per.size.toDouble
    val sx = per.map(_._1).sum / 100.0
    val sy = per.map(_._2).sum / 100.0
    val sxx = per.map(p => p._1 * p._1).sum / 10000.0
    val syy = per.map(p => p._2 * p._2).sum / 10000.0
    val sxy = per.map(p => p._1 * p._2).sum / 10000.0
    val cov = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val r = Inference.evalCuped(spark, dir).collect().head
    assert(r.getLong(0) == per.size)
    def close(a: Double, b: Double) =
      math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b))
    assert(close(r.getDouble(1), cov / vx), "theta")
    assert(close(r.getDouble(2), cov * cov / (vx * vy)), "var_reduction")
    // rho^2 is a fraction by Cauchy-Schwarz
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }
}
