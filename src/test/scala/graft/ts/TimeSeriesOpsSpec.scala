package graft.ts

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    // (series, t, value-with-gaps, meta)
    ("s1", 1L, null.asInstanceOf[java.lang.Double], "a"),
    ("s1", 2L, java.lang.Double.valueOf(10.0), "a"),
    ("s1", 3L, null.asInstanceOf[java.lang.Double], "b"),
    ("s1", 4L, java.lang.Double.valueOf(20.0), "b"),
    ("s2", 1L, java.lang.Double.valueOf(5.0), "a"))
    .toDF("sid", "t", "v", "meta")

  private def w = TimeSeriesOps.seriesWindow($"sid", Seq($"t"))

  test("T4 impute: forward fill + leading backfill") {
    val out = series.withColumn("f", TimeSeriesOps.impute($"v", w))
      .orderBy("sid", "t").select("f").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 10.0, 10.0, 20.0, 5.0))
  }

  test("T1 backfill carries last non-null downward only") {
    val out = series.withColumn("f", TimeSeriesOps.backfill($"v", w))
      .orderBy("sid", "t").collect().map(r => Option(r.getAs[java.lang.Double]("f")))
    assert(out.toSeq == Seq(None, Some(10.0), Some(10.0), Some(20.0), Some(5.0)))
  }

  test("T2 splitOnChange increments sub-series id on metadata change") {
    val out = series.withColumn("sub", TimeSeriesOps.splitOnChange($"meta", w))
      .orderBy("sid", "t").select("sub").as[Long].collect()
    assert(out.toSeq == Seq(1, 1, 2, 2, 1))
  }

  test("T2 splitOnChange keeps a null-metadata run as ONE sub-series") {
    val df = Seq(
      ("s", 1L, Some("A")), ("s", 2L, None), ("s", 3L, None),
      ("s", 4L, None), ("s", 5L, Some("B")))
      .toDF("sid", "t", "meta")
    val out = df.withColumn("sub", TimeSeriesOps.splitOnChange($"meta", w))
      .orderBy("t").select("sub").as[Long].collect()
    // A | null-run | B = three sub-series, not one per null row
    assert(out.toSeq == Seq(1, 2, 2, 2, 3))
  }

  test("T5 spike detection flags the middle outlier only") {
    val df = Seq(("s", 1L, 1.0), ("s", 2L, 1.1), ("s", 3L, 9.0), ("s", 4L, 1.2), ("s", 5L, 1.3))
      .toDF("sid", "t", "v")
    val flags = df.withColumn("spike", TimeSeriesOps.isSpike($"v", w))
      .orderBy("t").select("spike").as[Boolean].collect()
    assert(flags.toSeq == Seq(false, false, true, false, false))
  }

  test("A4 numeric share gate") {
    val df = Seq(("a", "1.5"), ("a", "2"), ("a", "x"), ("b", "y")).toDF("g", "v")
    val out = df.groupBy($"g").agg(TimeSeriesOps.numericShare($"v").as("s"))
      .orderBy("g").select("s").as[Double].collect()
    assert(math.abs(out(0) - 2.0 / 3.0) < 1e-12 && out(1) == 0.0)
  }

  test("OLS slope via sequential folds matches closed form") {
    val df = Seq((Seq(0.0, 1, 2, 3), Seq(1.0, 3, 5, 7))).toDF("xs", "ys")
    val slope = df.select(TimeSeriesOps.olsSlope($"xs", $"ys")).as[Double].collect().head
    assert(math.abs(slope - 2.0) < 1e-12)
  }
}
