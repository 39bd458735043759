package graft.queries

import graft.SparkSpec

/** Invariants of the feature-engineering suite beyond the DuckDB
  * oracles: pivot counts reconcile with the corpus total, target
  * encoding is a true shrinkage (between the category rate and the
  * global prior), equi-depth bins are balanced with ordered
  * non-overlapping edges, and winsorized values never leave the
  * [p05, p95] envelope.
  */
class FeatureQueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("pivot_events counts reconcile with the raw event total") {
    val p = FeatureQueries.pivotEvents(spark, dir)
    val typed = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
    val total = p.selectExpr(s"sum(${typed.mkString(" + ")}) as t")
      .collect().head.getLong(0)
    val raw = graft.Tables(spark, dir, "events").count()
    assert(total == raw)
    assert(p.columns.sorted.toSeq == ("user_id" +: typed).sorted)
  }

  test("encode_target shrinks the category rate toward the global prior") {
    val rows = FeatureQueries.encodeTarget(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt").toDouble
      val pos = r.getAs[Long]("pos").toDouble
      val prior = r.getAs[Double]("prior")
      val enc = r.getAs[Double]("target_enc")
      val raw = pos / cnt
      val lo = math.min(raw, prior) - 1e-12
      val hi = math.max(raw, prior) + 1e-12
      assert(enc >= lo && enc <= hi, s"enc $enc outside [$lo, $hi]")
    }
  }

  test("encode_binning yields 10 balanced, ordered, non-overlapping bins") {
    val rows = FeatureQueries.encodeBinning(spark, dir)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L until 10L))
    val counts = rows.map(_.getAs[Long]("cnt"))
    // near-unique doubles: equi-depth balance within a couple of rows
    assert(counts.max - counts.min <= 2,
      s"unbalanced bins: ${counts.mkString(",")}")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi_value") < b.getAs[Double]("lo_value"))
    }
  }

  test("winsorized values stay inside the [p05, p95] envelope") {
    val rows = FeatureQueries.encodeWinsorize(spark, dir).collect()
    assert(rows.nonEmpty)
    val lo = rows.filter(_.getAs[String]("clipped") == "low")
    val hi = rows.filter(_.getAs[String]("clipped") == "high")
    val none = rows.filter(_.getAs[String]("clipped") == "none")
    assert(none.nonEmpty)
    none.foreach(r => assert(
      r.getAs[Double]("winsorized") == r.getAs[Double]("o_totalprice")))
    (lo ++ hi).foreach(r => assert(
      r.getAs[Double]("winsorized") != r.getAs[Double]("o_totalprice")))
    // the envelope is consistent: every capped-low value is below every
    // uncapped value's floor; symmetric for capped-high
    if (lo.nonEmpty && none.nonEmpty)
      assert(lo.map(_.getAs[Double]("winsorized")).max <=
        none.map(_.getAs[Double]("o_totalprice")).min)
    if (hi.nonEmpty && none.nonEmpty)
      assert(hi.map(_.getAs[Double]("winsorized")).min >=
        none.map(_.getAs[Double]("o_totalprice")).max)
  }
}
