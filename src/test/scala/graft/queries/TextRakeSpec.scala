package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** text_rake / text_sentiment vs independent plain-Scala references. */
class TextRakeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs(): Array[(Long, Array[String])] =
    graft.Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0),
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toArray))

  test("text_rake equals the plain-Scala RAKE score") {
    val stop = TextFunctions.Stopwords.toSet
    val phrases = docs().flatMap { case (_, toks) =>
      // split maximal stopword-free runs
      val out = scala.collection.mutable.ArrayBuffer[Vector[String]]()
      var cur = Vector.empty[String]
      toks.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) { out += cur; cur = Vector.empty } }
        else cur :+= t
      }
      if (cur.nonEmpty) out += cur
      out
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def score(p: Vector[String]): Double =
      p.map(w => deg(w).toDouble / freq(w).toDouble).sum
    val best = phrases.map(p => p.mkString(" ") -> score(p)).toMap
    val counts = phrases.map(_.mkString(" ")).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = best.toSeq.sortBy { case (p, s) => (-s, p) }.take(20)
    val got = TextOps.textRake(spark, dir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (p, sc)) =>
      assert(r.getString(0) == p, s"phrase ${r.getString(0)} vs $p")
      assert(r.getLong(1) == counts(p), s"cnt for $p")
      assert(math.abs(r.getAs[Double]("score") - sc) < 1e-9, s"score for $p")
    }
  }

  test("text_sentiment equals the plain-Scala lexicon fold") {
    val lex = Map("fast" -> 2L, "big" -> 1L, "slow" -> -2L, "small" -> -1L, "dup" -> -2L)
    val got = TextOps.textSentiment(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    var checked = 0
    docs().foreach { case (id, toks) =>
      if (toks.nonEmpty) {
        val wts = toks.map(t => lex.getOrElse(t, 0L))
        val r = got(id)
        assert(r.getLong(1) == toks.length)
        assert(r.getLong(2) == wts.filter(_ > 0).sum)
        assert(r.getLong(3) == -wts.filter(_ < 0).sum)
        assert(r.getLong(4) == wts.sum)
        assert(r.getAs[Double]("polarity") == wts.sum.toDouble / toks.length)
        checked += 1
      }
    }
    assert(checked > 0 && got.size == checked)
  }
}
