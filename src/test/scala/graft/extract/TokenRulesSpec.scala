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
}
