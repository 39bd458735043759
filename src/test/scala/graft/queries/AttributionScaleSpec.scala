package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** attribution_position / feature_scale vs plain-Scala references. */
class AttributionScaleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("attribution_position equals the plain-Scala U-shaped credit") {
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val credit = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    val touchCount = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // split into paths ending at each purchase
      var path = Vector.empty[String]
      ordered.foreach { r =>
        if (r._4 == "purchase") {
          val n = path.length
          path.zipWithIndex.foreach { case (ch, i) =>
            touchCount(ch) += 1
            val c =
              if (n == 1) 1.0
              else if (i == 0 || i == n - 1) { if (n == 2) 0.5 else 0.4 }
              else 0.2 / (n - 2)
            credit(ch) += c
          }
          path = Vector.empty
        } else path :+= r._4
      }
    }
    val got = TimeSeriesQueries.attributionPosition(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getString(0)).toSet == credit.keySet)
    got.foreach { r =>
      val ch = r.getString(0)
      assert(r.getLong(1) == touchCount(ch), s"$ch touches")
      assert(math.abs(r.getAs[Double]("credit") - credit(ch)) < 1e-9, s"$ch credit")
    }
    // conservation: total credit == number of converting purchases with >=1 touch
    val totalCredit = got.map(_.getAs[Double]("credit")).sum
    assert(math.abs(totalCredit - math.round(totalCredit)) < 1e-6)
  }

  test("feature_scale equals plain-Scala z/minmax/robust scalers") {
    val ev = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byG = ev.groupBy(_._2)
    val got = FeatureQueries.featureScale(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0); val g = r.getString(1)
      assert(id % 47 == 0)
      val vs = byG(g).map(t => math.round(t._3 * 100.0))
      val v = math.round(r.getDouble(2) * 100.0)
      val n = vs.length
      val mean = vs.map(_.toDouble).sum / n
      val varp = vs.map(x => x * x.toDouble).sum / n - mean * mean
      val z = (v - mean) / math.sqrt(varp)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9, s"$id z")
      val mm = (v - vs.min).toDouble / (vs.max - vs.min)
      assert(math.abs(r.getAs[Double]("minmax") - mm) < 1e-12, s"$id minmax")
      val sorted = vs.sorted
      def sel(rank: Long): Long = sorted(math.max(rank, 1L).toInt - 1)
      val q1 = sel(math.max((n + 1) / 4, 1))
      val q2 = sel((n + 1) / 2)
      val q3 = sel(math.min(3L * (n + 1) / 4, n.toLong))
      if (q3 > q1) {
        val rb = (v - q2).toDouble / (q3 - q1)
        assert(math.abs(r.getAs[Double]("robust") - rb) < 1e-12, s"$id robust")
      }
    }
  }
}
