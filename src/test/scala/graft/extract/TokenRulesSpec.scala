package graft.extract

import graft.SparkSpec
import TokenRules._

class TokenRulesSpec extends SparkSpec {
  import spark.implicits._

  test("shape matchers compile to digit/case classes") {
    assert(matcherRegex(Shape("ddd")) == "\\d\\d\\d")
    assert(matcherRegex(Shape("Xx")) == "[A-Z][a-z]")
  }

  test("phone rule extracts with and without area code") {
    val df = Seq(
      "call 555 867 5309 now",
      "dial 867-5309 tonight",
      "no numbers here").toDF("t")
    val out = df.select(TokenRules.extract($"t", PhoneRule).as("ph"))
      .as[Seq[String]].collect()
    assert(out(0).exists(_.replaceAll("\\s+", " ").contains("555 867 5309")))
    assert(out(1).exists(_.contains("867 5309")))
    assert(out(2).isEmpty)
  }

  test("output=false tokens match but are excluded from the extraction") {
    val df = Seq("buy $AB now").toDF("t")
    val out = df.select(TokenRules.extract($"t", TickerRule).as("x"))
      .as[Seq[String]].collect().head
    assert(out == Seq("AB"))
  }

  test("token literal is case-insensitive by default, sensitive on flag") {
    val rule = Rule("born-1", Seq(
      RuleToken(TokenIs("born"), output = false),
      RuleToken(Shape("dddd"))))
    val df = Seq("She was Born 1867 in Paris").toDF("t")
    val out = df.select(TokenRules.extract($"t", rule).as("x"))
      .as[Seq[String]].collect().head
    assert(out == Seq("1867"))
  }

  test("rule name maps to field by stripping the index suffix") {
    assert(PhoneRule.field == "phone")
    assert(Rule("date_birth-2", Nil).field == "date_birth")
  }

  test("whole-token semantics: matchers never fire inside longer tokens") {
    // "died" must not match inside "studied"
    val died = Rule("d-1", Seq(RuleToken(TokenIs("died"), output = false),
      RuleToken(Shape("dddd"))))
    val out1 = Seq("she studied 1867 hard").toDF("t")
      .select(TokenRules.extract($"t", died).as("x")).as[Seq[String]].collect().head
    assert(out1.isEmpty)
    // a 4-digit number constraint must not extract a prefix of a 6-digit run
    val year = Rule("y-1", Seq(RuleToken(NumberTok(Nil, Seq(4)))))
    val out2 = Seq("code 123456 end", "year 1867 end").toDF("t")
      .select(TokenRules.extract($"t", year).as("x")).as[Seq[String]].collect()
    assert(out2(0).isEmpty)
    assert(out2(1) == Seq("1867"))
  }

  test("rangeRegex: exhaustive agreement with numeric comparison over probe windows") {
    val ranges = Seq[(Long, Option[Long])](
      (0L, Some(0L)), (0L, Some(9L)), (0L, Some(100L)), (1L, Some(1L)),
      (5L, Some(17L)), (10L, Some(99L)), (100L, Some(250L)), (37L, Some(2048L)),
      (1900L, Some(2100L)), (999L, Some(1000L)), (123L, Some(45678L)),
      (0L, None), (42L, None), (1000L, None))
    for ((lo, hi) <- ranges) {
      val rx = TokenRules.rangeRegex(lo, hi).r
      val probeHi = hi.getOrElse(lo + 200L) + 120L
      for (n <- math.max(0L, lo - 120L) to probeHi) {
        val expected = n >= lo && hi.forall(n <= _)
        assert(rx.matches(n.toString) == expected, s"[$lo,$hi] n=$n")
        // leading zeros compare numerically
        assert(rx.matches("00" + n) == expected, s"[$lo,$hi] n=00$n")
      }
    }
  }

  test("range + length-set intersection; unsatisfiable and negative bounds") {
    // length 4 AND minimum 500: exactly-4-digit strings with value >= 500
    // (leading zeros count toward the length, the value toward the range)
    val both = TokenRules.matcherRegex(
      NumberTok(Nil, Seq(4), Some(500L), None)).r
    assert(both.matches("0500") && both.matches("1700") && both.matches("9999"))
    assert(!both.matches("500")) // 3 digits: violates the length set
    assert(!both.matches("0499") && !both.matches("00042")) // below min / 5 digits
    // exhaustive window: every 4-digit string agrees with the conjunction
    for (n <- 0 to 10999) {
      val s = n.toString.reverse.padTo(4, '0').reverse.mkString
      val expected = s.length == 4 && s.forall(_.isDigit) && s.toLong >= 500
      assert(both.matches(s) == expected, s"s=$s")
    }
    // maximum < minimum is unsatisfiable: match NOTHING, never everything
    val contradictory = TokenRules.matcherRegex(
      NumberTok(Nil, Nil, Some(1700L), Some(1600L))).r
    assert((0 to 2000).forall(n => !contradictory.matches(n.toString)))
    // negative maximum: also unsatisfiable for non-negative digit runs
    val negMax = TokenRules.matcherRegex(
      NumberTok(Nil, Nil, None, Some(-3L))).r
    assert((0 to 100).forall(n => !negMax.matches(n.toString)))
    // negative minimum clips to 0: plain [0, max]
    val negMin = TokenRules.matcherRegex(
      NumberTok(Nil, Nil, Some(-5L), Some(10L))).r
    assert((0 to 10).forall(n => negMin.matches(n.toString)))
    assert(!negMin.matches("11"))
  }

  test("length >= 19 digits: decades beyond Long's 10^18 still compile exactly") {
    // length 19 with maximum >= 10^18: in-range 19-digit values MUST
    // match (the former Long-clamped formulation matched nothing here)
    val max19 = 5000000000000000000L // 5e18, a 19-digit Long
    val r19 = TokenRules.rangeRegexWithLengths(0L, Some(max19), Seq(19)).r
    assert(r19.matches("1000000000000000000")) // 10^18, padded to 19 via 0-pad
    assert(r19.matches("4999999999999999999"))
    assert(r19.matches("5000000000000000000"))
    assert(!r19.matches("5000000000000000001")) // above max
    assert(!r19.matches("100000000000000000"))  // 18 digits: length violated
    // minimum > 10^18, unbounded maximum: 19- and 20-digit values in range
    val min19 = 2000000000000000000L // 2e18
    val r1920 = TokenRules.rangeRegexWithLengths(min19, None, Seq(19, 20)).r
    assert(r1920.matches("2000000000000000000"))
    assert(r1920.matches("9999999999999999999"))  // 19 nines > Long.MaxValue
    assert(r1920.matches("10000000000000000000")) // any 20-digit value
    assert(r1920.matches("99999999999999999999"))
    assert(!r1920.matches("1999999999999999999")) // below min
    assert(!r1920.matches("999999999999999999"))  // 18 digits
    // whole decade below an 18-digit-bounded range at length 20: only
    // 0-padded in-range values match
    val rPad = TokenRules.rangeRegexWithLengths(10L, Some(12L), Seq(20)).r
    assert(rPad.matches("0" * 18 + "11"))
    assert(!rPad.matches("0" * 18 + "13"))
  }

  test("number minimum/maximum from rule JSON constrains the match") {
    val json =
      """{"rules":[{"pattern":[
        |  {"type":"word","token":["died"],"is_required":"true","is_in_output":"false"},
        |  {"type":"number","minimum":"1600","maximum":"1700",
        |   "is_required":"true","is_in_output":"true"}
        |]}]}""".stripMargin
    val rule = TokenRules.fromJson(json, "death").head
    assert(rule.tokens(1).matcher ==
      NumberTok(Nil, Nil, Some(1600L), Some(1700L)))
    val df = Seq("died 1669 in Amsterdam", "died 1750 later", "died 800 early")
      .toDF("t")
    val out = df.select(TokenRules.extract($"t", rule).as("x"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("1669"))
    assert(out(1).isEmpty) // above maximum
    assert(out(2).isEmpty) // below minimum
  }

  test("capitalization matchers: title/upper/lower/mixed word classes") {
    // "Died <TitleWord>" style rule: capitalized surname after a marker
    val rule = Rule("surname-1", Seq(
      RuleToken(TokenIs("died"), output = false),
      RuleToken(Capitalized("title"))))
    val df = Seq("The artist died Smith? no — Died Rembrandt 1669",
      "died lowercase stays out").toDF("t")
    val out = df.select(TokenRules.extract($"t", rule).as("x"))
      .as[Seq[String]].collect()
    assert(out(0).contains("Rembrandt") || out(0).contains("Smith"))
    assert(out(1).isEmpty) // lowercase after marker: no title match
    assert(matcherRegex(Capitalized("upper")) == "[A-Z]+")
    val mixedRx = matcherRegex(Capitalized("mixed"))
    assert("McDonald".matches(mixedRx) && !"UPPER".matches(mixedRx) && !"lower".matches(mixedRx))
  }

  test("number/linebreak/contain_digit/length matchers from rule JSON") {
    val json =
      """{"rules":[{"pattern":[
        |  {"type":"number","is_required":"true","is_in_output":"true",
        |   "numbers":[],"length":[]},
        |  {"type":"linebreak","is_required":"true","is_in_output":"false"},
        |  {"type":"word","token":[],"prefix":"","suffix":"",
        |   "capitalization":["title"],"is_required":"true","is_in_output":"true"}
        |]}]}""".stripMargin
    val rules = TokenRules.fromJson(json, "test")
    assert(rules.head.tokens(0).matcher == NumberTok(Nil, Nil))
    assert(rules.head.tokens(1).matcher == LineBreak())
    assert(rules.head.tokens(2).matcher == Capitalized("title"))
    val df = Seq("1669\nAmsterdam", "1669 Amsterdam no break").toDF("t")
    val out = df.select(TokenRules.extract($"t", rules.head).as("x"))
      .as[Seq[String]].collect()
    assert(out(0).exists(v => v.contains("1669") && v.contains("Amsterdam")))
    // POS-only token compiles to a real PosTok constraint (r3)
    val posOnly = TokenRules.fromJson(
      """{"rules":[{"pattern":[{"type":"word","token":[],
        |"part_of_speech":["NOUN"],"is_required":"true","is_in_output":"true"}]}]}""".stripMargin,
      "pos")
    assert(posOnly.head.tokens.head.matcher == PosTok(Seq("NOUN")))
    assert(matcherRegex(DigitWord()).nonEmpty && "ab3c".matches(matcherRegex(DigitWord())))
    assert(!"abc".matches(matcherRegex(DigitWord())))
    assert("abcde".matches(matcherRegex(WordLen(Seq(3, 5)))) &&
      !"abcd".matches(matcherRegex(WordLen(Seq(3, 5)))))
  }

  test("POS-lite: closed classes are exact lexicons, noun is the open complement") {
    val det = matcherRegex(PosTok(Seq("determiner")))
    assert("the".matches(det) && "The".matches(det) && "museum".matches(det) == false)
    val adp = matcherRegex(PosTok(Seq("preposition")))
    assert("in".matches(adp) && "painting".matches(adp) == false)
    val noun = matcherRegex(PosTok(Seq("NOUN")))
    assert("museum".matches(noun) && "painting".matches(noun))
    assert(!"the".matches(noun) && !"with".matches(noun) && !"1867".matches(noun))
    val verb = matcherRegex(PosTok(Seq("verb")))
    assert("painted".matches(verb) && "painting".matches(verb) && "was".matches(verb))
    val adv = matcherRegex(PosTok(Seq("adverb")))
    assert("quickly".matches(adv) && "very".matches(adv) && !"paint".matches(adv))
    val propn = matcherRegex(PosTok(Seq("proper noun")))
    assert("Rembrandt".matches(propn) && !"rembrandt".matches(propn))
    // multi-class alternation (mydig rules list several tags)
    val nv = matcherRegex(PosTok(Seq("noun", "num")))
    assert("museum".matches(nv) && "42".matches(nv) && !"the".matches(nv))
  }

  test("POS-lite: a DET+NOUN sequence rule constrains instead of matching anything") {
    val rule = Rule("np-1", Seq(
      RuleToken(PosTok(Seq("determiner")), output = false),
      RuleToken(PosTok(Seq("noun")))))
    val df = Seq(
      "she visited the museum yesterday", // "the museum" matches
      "went to a gallery downtown", // "a gallery" matches
      "in 1867 he painted daily" // no DET+NOUN pair: DET never fires
    ).toDF("t")
    val out = df.select(TokenRules.extract($"t", rule).as("x"))
      .as[Seq[String]].collect()
    assert(out(0).contains("museum"))
    assert(out(1).contains("gallery"))
    assert(out(2).isEmpty)
  }

  test("POS-lite: bare-POS rule from museum-style JSON end to end") {
    val json =
      """{"rules":[{"pattern":[
        |  {"type":"word","token":[],"part_of_speech":["verb"],
        |   "is_required":"true","is_in_output":"false"},
        |  {"type":"word","token":[],"part_of_speech":["preposition"],
        |   "is_required":"true","is_in_output":"false"},
        |  {"type":"word","token":[],"part_of_speech":["proper noun"],
        |   "is_required":"true","is_in_output":"true"}
        |]}]}""".stripMargin
    val rules = TokenRules.fromJson(json, "birthplace")
    val df = Seq(
      "Rembrandt was born in Leiden and painted in Amsterdam",
      "no pos sequence here at all").toDF("t")
    val out = df.select(TokenRules.extract($"t", rules.head).as("x"))
      .as[Seq[String]].collect()
    assert(out(0).exists(v => v == "Leiden" || v == "Amsterdam"))
    assert(out(1).isEmpty)
  }
}
