package graft.queries

import graft.SparkSpec

/** Ordered-fold time-series statistics: the in-plan array folds equal
  * a plain sequential Scala reference bit-for-bit (EWMA) / to full
  * double equality (autocorr), and OHLC selects the exact endpoint
  * values.
  */
class TsStatsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def evDf(rows: Seq[(Long, Long, String, Long, java.lang.Double)]) =
    rows.toDF("event_id", "user_id", "event_type", "ts_ms", "value")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_millis($"ts_ms").as("ts"), $"value",
        lit("{}").as("props"))

  private def writeDir(rows: Seq[(Long, Long, String, Long, java.lang.Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("tsstats").toString
    evDf(rows).coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts_ewma equals the sequential alpha=1/2 recurrence bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i.toLong, (i % 7).toLong, "m", rnd.nextInt(100000).toLong * 7 + i,
        java.lang.Double.valueOf(rnd.nextDouble() * 100 - 50))
    }
    val dir = writeDir(rows)
    val got = TimeSeriesQueries.tsEwma(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val expected = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (u, rs) =>
      val vs = rs.sortBy(r => (r._4, r._1)).map(_._5.doubleValue)
      (u, vs.size, vs.tail.foldLeft(vs.head)((a, v) => a * 0.5 + v * 0.5))
    }
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(java.lang.Double.doubleToLongBits(g._3) ==
        java.lang.Double.doubleToLongBits(e._3), s"user=${g._1}")
    }
  }

  test("ts_autocorr matches the sequential estimator; constant series is null") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 150).map { i =>
      (i.toLong, (i % 5).toLong, "m", i.toLong * 1000,
        java.lang.Double.valueOf(math.sin(i / 3.0) + rnd.nextDouble() * 0.1))
    } ++ Seq( // user 9: constant series -> den = 0 -> null r1
      (900L, 9L, "m", 0L, java.lang.Double.valueOf(4.0)),
      (901L, 9L, "m", 1000L, java.lang.Double.valueOf(4.0)),
      (902L, 9L, "m", 2000L, java.lang.Double.valueOf(4.0)))
    val dir = writeDir(rows)
    val got = TimeSeriesQueries.tsAutocorr(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(9L).isEmpty)
    rows.groupBy(_._2).filter(_._1 != 9L).foreach { case (u, rs) =>
      val vs = rs.sortBy(r => (r._4, r._1)).map(_._5.doubleValue)
      val m = vs.foldLeft(0.0)(_ + _) / vs.size
      val num = vs.init.zip(vs.tail).map { case (a, b) => (a - m) * (b - m) }
        .foldLeft(0.0)(_ + _)
      val den = vs.map(v => (v - m) * (v - m)).foldLeft(0.0)(_ + _)
      assert(got(u).contains(num / den), s"user=$u")
    }
  }

  test("ts_ohlc selects first/last values and exact extremes per bucket") {
    val day = 86400000L
    val rows = Seq(
      // type m, day 0: opens 3.0 (earliest ts), closes 7.0 (latest), low 1.5, high 9.0
      (1L, 1L, "m", 10L, java.lang.Double.valueOf(3.0)),
      (2L, 1L, "m", 500L, java.lang.Double.valueOf(9.0)),
      (3L, 2L, "m", 600L, java.lang.Double.valueOf(1.5)),
      (4L, 2L, "m", 900L, java.lang.Double.valueOf(7.0)),
      // same ts tie -> event_id breaks it: open is id 5
      (5L, 1L, "g", day + 5, java.lang.Double.valueOf(2.0)),
      (6L, 1L, "g", day + 5, java.lang.Double.valueOf(8.0)),
      // null value rows are excluded entirely
      (7L, 1L, "g", day + 9, null))
    val dir = writeDir(rows)
    val got = TimeSeriesQueries.tsOhlc(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(got(("m", 0L)) == ((3.0, 9.0, 1.5, 7.0, 4L)))
    assert(got(("g", 1L)) == ((2.0, 8.0, 2.0, 8.0, 2L)))
    assert(got.size == 2)
  }
}
