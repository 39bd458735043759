package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E8 landmark/Inferlink rule engine — full observed ItemRule surface
  * (SURVEY §2.3 E8; rule corpus
  * sample-projects/museum/...!landmark_rules/consolidated_rules.json):
  * begin_regex/end_regex span extraction with include_end_regex,
  * strip_end_regex cleanup, and removehtml post-processing; rules are
  * grouped per TLD (J5 broadcast lookup: docs route to their TLD's
  * rule set).
  */
object LandmarkRules {

  final case class ItemRule(
      name: String,
      beginRegex: String,
      endRegex: String,
      includeEnd: Boolean = false,
      stripEndRegex: String = "",
      removeHtml: Boolean = true) {
    /** field = name minus trailing rule indices (em_base.py:67-69). */
    def field: String = name.replaceAll("(-\\d+)+$", "")
  }

  /** Neutralize capturing groups inside a rule-supplied regex: the
    * extraction relies on OUR span group being group 1, so any '(' the
    * rule author wrote (alternations like '<(b|strong)>') must become
    * non-capturing or regexp_extract returns the wrong group.
    * Class- and escape-aware scan: '(' inside a character class is a
    * literal, '\\(' is escaped, and '\\\\(' (escaped backslash, then a
    * real group) must still be rewritten — a lookbehind regex can't
    * distinguish those.
    */
  /** True when the pattern uses backreferences (\1-style or \k<name>):
    * rewriting ANY group would then break compilation or semantics, so
    * such rules keep their groups (accepting the pre-existing
    * group-shift behavior) rather than turning a working rule into a
    * PatternSyntaxException.
    */
  private def hasBackref(rx: String): Boolean = {
    var i = 0
    while (i < rx.length - 1) {
      if (rx.charAt(i) == '\\') {
        val c = rx.charAt(i + 1)
        if (c.isDigit || c == 'k') return true
        i += 2
      } else i += 1
    }
    false
  }

  private[extract] def nonCapturing(rx: String): String = {
    if (hasBackref(rx)) return rx
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < rx.length) {
      rx.charAt(i) match {
        case '\\' if i + 1 < rx.length => // escape: copy both chars verbatim
          sb.append(rx.charAt(i)).append(rx.charAt(i + 1)); i += 1
        case '[' if !inClass => inClass = true; sb.append('[')
        case ']' if inClass => inClass = false; sb.append(']')
        case '(' if !inClass =>
          // '(?<name>' is a NAMED CAPTURING group (unlike the '(?<=' /
          // '(?<!' lookbehinds) — it shifts numbering just like a bare
          // '(' and must also become non-capturing
          val isNamed = i + 2 < rx.length && rx.charAt(i + 1) == '?' &&
            rx.charAt(i + 2) == '<' && i + 3 < rx.length &&
            Character.isLetter(rx.charAt(i + 3))
          if (isNamed) {
            sb.append("(?:")
            i = rx.indexOf('>', i + 3) // loop increment steps past '>'
            if (i < 0) i = rx.length
          } else if (i + 1 < rx.length && rx.charAt(i + 1) == '?') sb.append('(')
          else sb.append("(?:")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Compile one rule into an extraction column over raw HTML. */
  def extract(raw: Column, rule: ItemRule): Column = {
    val begin = nonCapturing(rule.beginRegex)
    val end = nonCapturing(rule.endRegex)
    val span =
      if (rule.includeEnd)
        regexp_extract(raw, s"(?s)$begin(.*?$end)", 1)
      else
        regexp_extract(raw, s"(?s)$begin(.*?)$end", 1)
    val stripped =
      if (rule.stripEndRegex.nonEmpty)
        regexp_replace(span, s"(?s)${rule.stripEndRegex}\\s*$$", "")
      else span
    val cleaned =
      if (rule.removeHtml)
        trim(regexp_replace(regexp_replace(stripped, "(?s)<[^>]*>", " "), "\\s+", " "))
      else trim(stripped)
    cleaned
  }

  /** Numeric rule order from the trailing indices (field-i-j): the
    * generated em modules iterate rules in index order, and a
    * lexicographic name sort would rank '...-0-10' before '...-0-2'.
    */
  private def ruleOrder(name: String): (String, Seq[Int]) = {
    val idx = "-(\\d+)".r.findAllMatchIn(name).map(_.group(1).toInt).toSeq
    (name.replaceAll("(-\\d+)+$", ""), idx)
  }

  /** Apply a TLD's rule set: one column per field (first rule per field
    * wins in NUMERIC index order, matching the generated em modules).
    */
  def applyRules(docs: DataFrame, rawCol: String, rules: Seq[ItemRule]): DataFrame =
    rules.groupBy(_.field).toSeq.sortBy(_._1).foldLeft(docs) {
      case (d, (field, rs)) =>
        val ordered = rs.sortBy(r => ruleOrder(r.name)._2.toList)(
          scala.math.Ordering.Implicits.seqOrdering[List, Int])
        val exprs = ordered.map(r => extract(col(rawCol), r))
        val firstNonEmpty = exprs
          .map(e => when(length(e) > 0, e))
          .reduce((a, b) => coalesce(a, b))
        d.withColumn(field, firstNonEmpty)
    }

  /** Load the consolidated_rules.json corpus: tld → rule sets. */
  def fromJson(json: String): Map[String, Seq[ItemRule]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val out = scala.collection.mutable.Map[String, Seq[ItemRule]]()
    root.properties().forEach { e =>
      val tld = e.getKey
      val rules = scala.collection.mutable.ArrayBuffer[ItemRule]()
      e.getValue.forEach { entry =>
        val rs = entry.get("rules")
        if (rs != null) rs.forEach { r =>
          if (r.path("rule_type").asText() == "ItemRule")
            rules += ItemRule(
              name = r.path("name").asText(),
              beginRegex = r.path("begin_regex").asText(),
              endRegex = r.path("end_regex").asText(),
              includeEnd = r.path("include_end_regex").asBoolean(false),
              stripEndRegex = r.path("strip_end_regex").asText(""),
              removeHtml = r.path("removehtml").asBoolean(true))
        }
      }
      out(tld) = rules.toSeq
    }
    out.toMap
  }
}
