package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** kg_spellfix recall/precision and join_salted result invariance. */
class SpellfixSaltSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kg_spellfix: every misspelling recovers its source word; all candidates are within d=1") {
    val vocab = graft.Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val got = KgPipeline.kgSpellfix(spark, dir).collect()
    assert(got.nonEmpty)
    val byQ = got.groupBy(_.getString(0))
    // precision: every suggestion is a vocab word within distance 1
    got.foreach { r =>
      val q = r.getString(0); val sug = r.getString(2)
      assert(vocab.contains(sug), s"$sug not in vocab")
      assert(lev(q, sug) <= 1, s"$q -> $sug too far")
      assert(r.getInt(4) == lev(q, sug), s"$q -> $sug dist column")
    }
    // recall: for each misspelled query, the TRUE source word appears
    // among candidates unless 3 more-frequent d<=1 words crowded it out
    vocab.keys.filter(_.length >= 3).foreach { w =>
      val p = w.length % 3 + 1
      val q = w.substring(0, p - 1) + w.substring(p)
      val rows = byQ.getOrElse(q, Array.empty)
      val crowd = vocab.filter { case (v, f) =>
        lev(q, v) <= 1 && (f > vocab(w) || (f == vocab(w) && v < w)) }
      if (rows.map(_.getString(2)).contains(w)) ()
      else assert(crowd.size >= 3, s"$w missing from suggestions of $q without a crowd")
    }
  }

  test("join_salted equals the plain unsalted join exactly") {
    val salted = Relational.joinSalted(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = graft.Tables(spark, dir, "events")
      .select(col("event_type")).collect().map(_.getString(0))
    val expected = ev.groupBy(identity).toSeq.sortBy(_._1).map { case (t, rs) =>
      (t, rs.length.toLong, t.length.toLong, rs.length.toLong * t.length)
    }
    assert(salted.toSeq == expected)
  }
}
