package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.MappingRules
import graft.operators.KgOps
import graft.ts.{SpreadsheetRegions, TrendFit}

/** ScalaCheck-generator properties for the pure rule functions
  * (SURVEY §5: the recode/delete/template/guard DSL pieces are pure —
  * ideal property targets). Deterministic seeds.
  */
class RulePropertiesSpec extends AnyFunSuite {

  private def forAllN[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val word = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)

  test("P16 defaultFieldName is idempotent and emits only [a-z0-9_]") {
    forAllN(Gen.asciiPrintableStr) { s =>
      val f = MappingRules.defaultFieldName(s)
      assert(f.matches("[a-z0-9_]*"), s"bad field name from ${s.take(20)}: $f")
      assert(MappingRules.defaultFieldName(f) == f)
    }
  }

  test("Q2 normalizers: digits_only emits digits; strip_stopwords idempotent") {
    forAllN(Gen.asciiPrintableStr) { s =>
      assert(KgOps.normalize(Seq("digits_only"))(s).matches("[0-9]*"))
    }
    forAllN(Gen.listOf(word).map(_.mkString(" "))) { s =>
      val once = KgOps.normalize(Seq("lower", "strip_stopwords"))(s)
      assert(KgOps.normalize(Seq("lower", "strip_stopwords"))(once) == once)
    }
  }

  test("S4 parseLoc round-trips generated A1-style references") {
    def colName(c: Int): String = {
      var n = c + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    forAllN(Gen.zip(Gen.choose(0, 700), Gen.choose(0, 9999))) { case (c, r) =>
      val loc = SpreadsheetRegions.parseLoc(s"${colName(c)}${r + 1}")
      assert(loc == SpreadsheetRegions.Loc(Some(c), Some(r)))
    }
  }

  test("T9 describeSlope is monotone in the slope") {
    forAllN(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0))) {
      case (a, b) =>
        val labels = graft.ts.TimeSeriesOps.SlopeLabels
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        assert(labels.indexOf(TrendFit.describeSlope(lo)) <=
          labels.indexOf(TrendFit.describeSlope(hi)))
    }
  }

  test("T10 connectDots produces contiguous segments covering the x span") {
    val pts = Gen.chooseNum(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0)))
    forAllN(pts, n = 100) { ys =>
      val xs = ys.indices.map(_.toDouble).toArray
      val segs = TrendFit.connectDots(xs, ys.toArray)
      assert(segs.length == ys.length - 1)
      assert(segs.head.startX == 0.0 && segs.last.endX == xs.last)
      assert(segs.sliding(2).forall {
        case Array(s1, s2) => s1.endX == s2.startX
        case _ => true
      })
    }
  }

  test("E3 compiled rule regexes are valid patterns") {
    import graft.extract.TokenRules._
    val shapeGen = Gen.nonEmptyListOf(Gen.oneOf('d', 'x', 'X')).map(_.mkString)
    val matcherGen: Gen[Matcher] = Gen.oneOf(
      shapeGen.map(Shape(_)), word.map(TokenIs(_)),
      Gen.const(AnyToken()), word.map(Prefix(_)), word.map(Suffix(_)))
    val ruleGen = Gen.nonEmptyListOf(
      Gen.zip(matcherGen, Gen.oneOf(true, false), Gen.oneOf(true, false))
        .map { case (m, r, o) => RuleToken(m, r, o) })
      .map(ts => Rule("gen-1", ts.take(4)))
    forAllN(ruleGen, n = 100) { rule =>
      val (rx, _) = compile(rule)
      java.util.regex.Pattern.compile(rx) // must not throw
    }
  }
}
