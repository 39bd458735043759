package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[RankingEval]] certified against an independent plain-Scala
  * reference: per-user top-10 lists rebuilt with a plain sort, then
  * textbook nDCG / MRR / AP formulas (math.log-based — the operators
  * embed the same discounts as literals, so values agree to the ulp).
  */
class RankingEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // (user, ranked rel flags ≤10) rebuilt independently
  private def topLists(): Map[Long, Vector[Int]] = {
    val ev = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("value"), col("event_id"),
        (col("event_type") === "purchase").cast("int").as("rel"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(r => (-r._2, r._3)).take(10).map(_._4).toVector
    }
  }

  test("eval_ndcg equals the textbook log2-discount formula") {
    val got = RankingEval.evalNdcg(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val lists = topLists()
    assert(got.keySet == lists.keySet)
    var withRel = 0
    lists.foreach { case (u, rels) =>
      val disc = rels.indices.map(i => 1.0 / (math.log(i + 2.0) / math.log(2.0)))
      val dcg = rels.zip(disc).map { case (r, d) => r * d }.sum
      val r10 = rels.sum
      val r = got(u)
      assert(r.getAs[Long]("n_top") == rels.length, s"user $u n_top")
      assert(r.getAs[Long]("r10") == r10, s"user $u r10")
      if (r10 > 0) {
        val idcg = (0 until r10).map(i => 1.0 / (math.log(i + 2.0) / math.log(2.0))).sum
        assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-12, s"user $u ndcg")
        withRel += 1
      } else assert(r.isNullAt(r.fieldIndex("ndcg")), s"user $u null ndcg")
    }
    assert(withRel > 0)
  }

  test("eval_mrr equals 1/first-relevant-rank") {
    val got = RankingEval.evalMrr(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    topLists().foreach { case (u, rels) =>
      val first = rels.indexWhere(_ == 1)
      val r = got(u)
      if (first >= 0)
        assert(r.getAs[Double]("mrr") == 1.0 / (first + 1), s"user $u mrr")
      else assert(r.isNullAt(r.fieldIndex("mrr")), s"user $u null mrr")
    }
  }

  test("eval_map equals the textbook average precision over the top-10 window") {
    val got = RankingEval.evalMap(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    topLists().foreach { case (u, rels) =>
      val r10 = rels.sum
      val r = got(u)
      if (r10 > 0) {
        var c = 0; var s = 0.0
        rels.zipWithIndex.foreach { case (rel, i) =>
          if (rel == 1) { c += 1; s += c.toDouble / (i + 1) }
        }
        assert(math.abs(r.getAs[Double]("ap") - s / r10) < 1e-12, s"user $u ap")
      } else assert(r.isNullAt(r.fieldIndex("ap")), s"user $u null ap")
    }
  }
}
