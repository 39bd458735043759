package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** E3 token-sequence rule extractor (SURVEY §2.3; reference
  * `extract_using_custom_spacy`, generate_mydig_config.py:46-63, rule
  * format sample-projects/museum/...!spacy_rules/phone.json).
  *
  * The observed rule subset (SURVEY §7 hard parts): a rule is a token
  * sequence; each token matcher is one of
  *   - `token`: literal word (case-insensitive option)
  *   - `shape`: d→digit, x→lower, X→upper (e.g. "ddd" = 3 digits)
  *   - `punct`: a punctuation class
  *   - `prefix`/`suffix`: word affix constraints
  *   - `capitalization`: title/upper/lower/mixed word classes
  *   - `number`: digit runs, allowed-value lists, digit-length sets,
  *     integer value ranges (minimum/maximum → exact digit-class regex)
  *   - `linebreak`, `contain_digit`, `length` (token-length set)
  * with `required` (optional tokens may be absent) and `output` (only
  * flagged tokens join the extraction) flags. Bare `part_of_speech`
  * constraints compile through the POS-lite [[PosLexicon]] tagger
  * (closed-class lexicons + open-class suffix heuristics) — a real
  * constraint, heuristic rather than spaCy-parity (documented). Number
  * value ranges compile to exact digit-class alternations
  * ([[rangeRegex]]); the only remaining fallback is NON-integer range
  * bounds (documented).
  *
  * Rules compile once (driver-side) to a single Java regex evaluated by
  * codegen'd `regexp_extract_all` — the per-document work is one regex
  * scan, no UDF, no shuffle.
  */
object TokenRules {

  sealed trait Matcher
  final case class TokenIs(word: String, caseSensitive: Boolean = false) extends Matcher
  final case class Shape(shape: String) extends Matcher
  final case class Punct(chars: String) extends Matcher
  final case class Prefix(p: String) extends Matcher
  final case class Suffix(s: String) extends Matcher
  final case class AnyToken() extends Matcher
  /** Capitalization shape (rule field `capitalization`): title | upper |
    * lower | mixed — regex-able word classes, so these rules no longer
    * degrade to AnyToken.
    */
  final case class Capitalized(kind: String) extends Matcher
  /** `number` token type: any digit run, a specific allowed list, a
    * digit-length set, or an integer value range (minimum/maximum —
    * compiled to an exact digit-class alternation, see [[rangeRegex]];
    * leading zeros allowed, matching numeric comparison semantics).
    * Precedence when several constraints appear: a numbers list wins;
    * a range INTERSECTS a digit-length set ([[rangeRegexWithLengths]]
    * — leading zeros count toward the length, the numeric value
    * toward the range); lengths alone compile as before. An
    * unsatisfiable range (maximum < minimum) compiles to
    * [[NeverMatch]]. Non-integer bounds fall back to the
    * unconstrained digit run (documented subset).
    */
  final case class NumberTok(numbers: Seq[String], lengths: Seq[Int],
                             min: Option[Long] = None,
                             max: Option[Long] = None) extends Matcher
  /** `linebreak` token type. */
  final case class LineBreak() extends Matcher
  /** Word constrained to contain a digit (`contain_digit`). */
  final case class DigitWord() extends Matcher
  /** Word with an allowed token-length set (`length`). */
  final case class WordLen(lengths: Seq[Int]) extends Matcher
  /** Bare `part_of_speech` constraint (mydig spacy-rule token schema;
    * r2 verdict item #5). Compiled through [[PosLexicon]]: closed
    * classes (determiners, prepositions, pronouns, conjunctions,
    * auxiliaries) are finite lexicons — exact regex alternations;
    * open classes (verb, adjective, adverb, proper noun) use suffix /
    * capitalization heuristics; noun is the open-class complement
    * (any word that is not a closed-class word, not a bare number).
    * A heuristic tagger, not spaCy parity — but a real constraint:
    * "the" no longer matches a NOUN slot, so bare-POS rules constrain
    * instead of degrading to AnyToken.
    */
  final case class PosTok(classes: Seq[String]) extends Matcher
  /** Alternation over matchers (rule files list several tokens/shapes). */
  final case class OneOf(opts: Seq[Matcher]) extends Matcher

  final case class RuleToken(
      matcher: Matcher,
      required: Boolean = true,
      output: Boolean = true)

  final case class Rule(name: String, tokens: Seq[RuleToken]) {
    /** Field name: strip the trailing rule index (em_base.py:67-69). */
    def field: String = name.replaceAll("-\\d+$", "")
  }

  private def q(s: String) = java.util.regex.Pattern.quote(s)

  /** Exact regex for decimal integers in [lo, hi] (hi None = unbounded)
    * — the reference's number minimum/maximum constraint, which a
    * numeric comparator would enforce post-parse, enforced IN the
    * single-regex scan instead. Classic digit-class construction: equal
    * -length ranges split on the first differing digit into a low
    * branch, full middle classes, and a high branch; across lengths,
    * intermediate digit counts are whole `[1-9]\d{n}` classes. `0*`
    * allows leading zeros (numeric, not lexical, semantics).
    */
  private def cls(a: Char, b: Char) = if (a == b) a.toString else s"[$a-$b]"
  private def dAll(n: Int) = if (n <= 0) "" else if (n == 1) "\\d" else s"\\d{$n}"

  /** All patterns for decimal strings of exactly `a.length` digits in
    * [a, b] (a, b equal-length digit strings, a <= b): equal-length
    * ranges split on the first differing digit into a low branch, full
    * middle classes, and a high branch.
    */
  private def sameLen(a: String, b: String): Seq[String] =
    if (a == b) Seq(a)
    else if (a.length == 1) Seq(cls(a.head, b.head))
    else if (a.head == b.head) sameLen(a.tail, b.tail).map(a.head.toString + _)
    else {
      val loPart =
        if (a.tail.forall(_ == '0')) Seq(s"${a.head}${dAll(a.length - 1)}")
        else sameLen(a.tail, "9" * (a.length - 1)).map(a.head.toString + _)
      val mid =
        if (b.head - a.head >= 2)
          Seq(s"${cls((a.head + 1).toChar, (b.head - 1).toChar)}${dAll(a.length - 1)}")
        else Nil
      val hiPart =
        if (b.tail.forall(_ == '9')) Seq(s"${b.head}${dAll(b.length - 1)}")
        else sameLen("0" * (b.length - 1), b.tail).map(b.head.toString + _)
      loPart ++ mid ++ hiPart
    }

  /** A fragment that can never match — the compilation of an
    * UNSATISFIABLE constraint (e.g. minimum > maximum). Falling back to
    * `\d+` instead would silently widen a contradictory rule to
    * match-everything.
    */
  val NeverMatch = "(?!)"

  def rangeRegex(lo: Long, hi: Option[Long]): String = {
    require(lo >= 0 && hi.forall(_ >= lo), s"bad number range [$lo, $hi]")
    val zero = if (lo == 0L) Seq("0") else Nil
    val lo1 = math.max(lo, 1L)
    val loS = lo1.toString
    val alts = zero ++ (hi match {
      case None =>
        sameLen(loS, "9" * loS.length) :+ s"[1-9]\\d{${loS.length},}"
      case Some(h) if h == 0L => Nil // lo == hi == 0: `zero` covers it
      case Some(h) =>
        val hiS = h.toString
        if (loS.length == hiS.length) sameLen(loS, hiS)
        else {
          val between = (loS.length + 1) until hiS.length
          sameLen(loS, "9" * loS.length) ++
            between.map(l => s"[1-9]${dAll(l - 1)}") ++
            sameLen("1" + "0" * (hiS.length - 1), hiS)
        }
    })
    alts.mkString("0*(?:", "|", ")")
  }

  /** Range ∩ digit-length-set intersection: exactly `l` digits
    * (leading zeros count toward the length, numeric value toward the
    * range — "0500" satisfies length 4 AND minimum 500). For each
    * allowed length l and value digit-count d ≤ l, the value range
    * clips against [10^(d−1), 10^d−1] and compiles via [[sameLen]]
    * behind an exact 0-pad. Empty intersection → [[NeverMatch]].
    */
  def rangeRegexWithLengths(lo: Long, hi: Option[Long], lengths: Seq[Int]): String = {
    // BigInt decade clipping: [[sameLen]] is pure string recursion, so
    // it compiles ranges of ANY digit count — clamping decades at
    // Long's 10^18 (the earlier formulation) silently under-matched
    // 19+-digit values whose decade intersects the range (e.g. length
    // 19 with maximum >= 10^18, or minimum > 10^18 with unbounded max)
    val loB = BigInt(lo)
    val hiB = hi.map(BigInt(_))
    val alts = lengths.distinct.sorted.flatMap { l =>
      (1 to l).flatMap { d =>
        val dLo = if (d == 1) BigInt(0) else BigInt(10).pow(d - 1)
        val dHi = BigInt(10).pow(d) - 1
        val lo2 = loB.max(dLo)
        val hi2 = hiB.getOrElse(dHi).min(dHi)
        if (lo2 > hi2) None
        else {
          val pad = if (l - d == 0) "" else if (l - d == 1) "0" else s"0{${l - d}}"
          Some(pad + sameLen(lo2.toString, hi2.toString).mkString("(?:", "|", ")"))
        }
      }
    }
    if (alts.isEmpty) NeverMatch else alts.mkString("(?:", "|", ")")
  }

  /** One token matcher → regex fragment (token boundary handled by the
    * separator joining).
    */
  def matcherRegex(m: Matcher): String = m match {
    case TokenIs(w, cs) =>
      if (cs) q(w) else w.toCharArray.map { ch =>
        if (ch.isLetter) s"[${ch.toLower}${ch.toUpper}]" else q(ch.toString)
      }.mkString
    case Shape(shape) =>
      shape.map {
        case 'd' => "\\d"
        case 'x' => "[a-z]"
        case 'X' => "[A-Z]"
        case c => q(c.toString)
      }.mkString
    case Punct(chars) => s"[${chars.flatMap(c => "\\" + c)}]"
    case Prefix(p) => s"${q(p)}\\w*"
    case Suffix(s) => s"\\w*${q(s)}"
    case AnyToken() => "\\w+"
    case Capitalized("title") => "[A-Z][a-z]*"
    case Capitalized("upper") => "[A-Z]+"
    case Capitalized("lower") => "[a-z]+"
    case Capitalized(_) => // mixed: both cases present
      "(?=[A-Za-z]*[A-Z])(?=[A-Za-z]*[a-z])[A-Za-z]+"
    case NumberTok(ns, _, _, _) if ns.nonEmpty => ns.map(q).mkString("(?:", "|", ")")
    case NumberTok(_, ls, mn, mx) if mn.isDefined || mx.isDefined =>
      // digit runs are non-negative: a negative minimum clips to 0, a
      // maximum below the minimum (incl. any negative maximum) is
      // UNSATISFIABLE and must match nothing, not everything
      val lo = math.max(mn.getOrElse(0L), 0L)
      if (mx.exists(_ < lo)) NeverMatch
      else if (ls.nonEmpty) rangeRegexWithLengths(lo, mx, ls)
      else rangeRegex(lo, mx)
    case NumberTok(_, ls, _, _) if ls.nonEmpty =>
      ls.map(l => s"\\d{$l}").mkString("(?:", "|", ")")
    case NumberTok(_, _, _, _) => "\\d+"
    case LineBreak() => "\\r?\\n"
    case DigitWord() => "(?=\\w*\\d)\\w+"
    case WordLen(ls) => ls.map(l => s"\\w{$l}").mkString("(?:", "|", ")")
    case PosTok(cls) => cls.map(PosLexicon.regexFor).mkString("(?:", "|", ")")
    case OneOf(opts) => opts.map(matcherRegex).mkString("(?:", "|", ")")
  }

  /** Load the reference's spacy-rule JSON (museum spacy_rules files):
    * pattern token types word/token, shape, punctuation with
    * is_required / is_in_output flags and prefix/suffix constraints.
    * `onlyActive = true` keeps just `is_active == "true"` rules — the
    * subset the reference engine applies (inactive rules are edited-
    * out drafts kept in the file; the corpus fixtures' `results` are
    * generated from the active set). Rule indices still count EVERY
    * rule in file order, so `name-idx` identifies the same rule under
    * either loading mode.
    */
  def fromJson(json: String, name: String,
      onlyActive: Boolean = false): Seq[Rule] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val rules = scala.collection.mutable.ArrayBuffer[Rule]()
    val arr = root.path("rules")
    var idx = 0
    arr.forEach { r =>
      if (onlyActive && r.path("is_active").asText("true") != "true") {
        idx += 1
      } else {
      val toks = scala.collection.mutable.ArrayBuffer[RuleToken]()
      r.path("pattern").forEach { t =>
        def strings(field: String): Seq[String] = {
          val b = scala.collection.mutable.ArrayBuffer[String]()
          t.path(field).forEach(v => b += v.asText())
          b.toSeq
        }
        val lengths = strings("length").flatMap(_.toIntOption)
        val m: Matcher = t.path("type").asText() match {
          case "shape" =>
            val shapes = strings("shapes") ++ strings("shape")
            if (shapes.isEmpty) AnyToken()
            else if (shapes.size == 1) Shape(shapes.head)
            else OneOf(shapes.map(Shape(_)))
          case "punctuation" =>
            val ts = strings("token")
            if (ts.isEmpty) Punct(".,;:!?()[]")
            else Punct(ts.mkString)
          case "number" =>
            // numbers list > value range (minimum/maximum, compiled to
            // an exact digit-class alternation) > digit-length set
            def bound(field: String): Option[Long] = {
              val n = t.path(field)
              if (n.isMissingNode) None
              else if (n.isNumber && n.asText.forall(c => c.isDigit || c == '-'))
                Some(n.asLong)
              else n.asText("").toLongOption
            }
            // bounds kept RAW — matcherRegex clips a negative minimum
            // to 0 and compiles max < min (incl. negative max) to a
            // never-matching fragment
            NumberTok(strings("numbers"), lengths, bound("minimum"), bound("maximum"))
          case "linebreak" => LineBreak()
          case _ => // word/token
            val ts = strings("token")
            val prefix = t.path("prefix").asText("")
            val suffix = t.path("suffix").asText("")
            val caps = strings("capitalization")
            val containDigit = t.path("contain_digit").asText("") == "true"
            if (ts.nonEmpty) {
              if (ts.size == 1) TokenIs(ts.head)
              else OneOf(ts.map(TokenIs(_)))
            }
            else if (prefix.nonEmpty) Prefix(prefix)
            else if (suffix.nonEmpty) Suffix(suffix)
            else if (caps.nonEmpty) {
              if (caps.size == 1) Capitalized(caps.head)
              else OneOf(caps.map(Capitalized(_)))
            }
            else if (containDigit) DigitWord()
            else if (lengths.nonEmpty) WordLen(lengths)
            else {
              // bare part_of_speech: POS-lite lexicon/suffix tagger
              // (see PosLexicon) — no longer degrades to AnyToken
              val pos = strings("part_of_speech")
              if (pos.nonEmpty) PosTok(pos) else AnyToken()
            }
        }
        toks += RuleToken(m,
          required = t.path("is_required").asText("true") == "true",
          output = t.path("is_in_output").asText("true") == "true")
      }
      rules += Rule(s"$name-$idx", toks.toSeq)
      idx += 1
      }
    }
    rules.toSeq
  }

  /** Word-like matchers describe WHOLE tokens (the reference tokenizes
    * before matching) — without boundaries, `\d{4}` would extract
    * "1234" out of "123456" and "died" would match inside "studied".
    * Punctuation and linebreaks are their own token class and need no
    * boundary.
    */
  private def needsBoundary(m: Matcher): Boolean = m match {
    case Punct(_) | LineBreak() => false
    case OneOf(opts) => opts.exists(needsBoundary)
    case _ => true
  }

  /** Compile a rule to (regex, output-group indices). Tokens separated
    * by optional whitespace/punct glue (the tokenizer's inter-token
    * separators); optional tokens wrapped in `(?:...)?`; word-like
    * tokens anchored with non-word lookarounds (whole-token semantics).
    */
  def compile(rule: Rule): (String, Seq[Int]) = {
    val sep = "[\\s\\-.()]*"
    val parts = rule.tokens.zipWithIndex.map { case (t, i) =>
      val body =
        if (needsBoundary(t.matcher)) s"(?<!\\w)(?:${matcherRegex(t.matcher)})(?!\\w)"
        else matcherRegex(t.matcher)
      val core = s"($body)"
      val withSep = if (i == 0) core else s"(?:$sep$core)"
      if (t.required) withSep else s"$withSep?"
    }
    val outGroups = rule.tokens.zipWithIndex.filter(_._1.output).map(_._2 + 1)
    (parts.mkString, outGroups)
  }

  /** Apply a rule to a text column → array of extractions (each match's
    * output groups joined by a space).
    */
  def extract(c: Column, rule: Rule): Column = {
    val (rx, groups) = compile(rule)
    val matches = regexp_extract_all(c, lit(s"($rx)"), lit(0))
    // re-extract output groups per match (groups shift by 1 for the
    // wrapping group); join non-empty group values with single spaces.
    // Rules with only optional tokens match the empty string — drop
    // empty extractions (the reference emits no value for them either).
    val values = transform(matches, m => {
      val parts = groups.map(g => regexp_extract(m, rx, g))
      trim(regexp_replace(concat_ws(" ", parts: _*), "\\s+", " "))
    })
    filter(values, v => length(v) > 0)
  }

  /** The reference's canonical phone rule (museum spacy_rules/phone.json:
    * optional area code in parens + ddd + dddd).
    */
  val PhoneRule: Rule = Rule("phone-1", Seq(
    RuleToken(Shape("ddd"), required = false),
    RuleToken(Shape("ddd")),
    RuleToken(Shape("dddd"))))

  /** Stock-ticker style rule: 2-5 uppercase letters after a $ or colon. */
  val TickerRule: Rule = Rule("stock_ticker-1", Seq(
    RuleToken(Punct("$:"), output = false),
    RuleToken(Shape("XX"))))
}

/** POS-lite tagger for bare `part_of_speech` rule tokens (E3; r2
  * verdict #5). English closed classes are small finite lexicons, so
  * they compile to exact case-insensitive alternations; open classes
  * use the standard suffix/capitalization heuristics. Everything stays
  * a regex fragment, so POS-constrained rules ride the same single
  * codegen'd `regexp_extract_all` scan as every other matcher — no
  * per-token UDF, no model, no shuffle.
  *
  * Accepted class names (normalized: lowercase, space→underscore) are
  * the mydig rule-editor names with their Universal-POS aliases:
  * noun, proper_noun/propn, pronoun/pron, verb, auxiliary/aux,
  * adjective/adj, adverb/adv, determiner/det,
  * preposition/adposition/adp, conjunction/cconj/sconj, number/num,
  * interjection/intj. Unknown names fall back to `\w+` (AnyToken
  * semantics) rather than failing the rule load.
  */
object PosLexicon {

  val Determiners: Seq[String] = Seq(
    "the", "a", "an", "this", "that", "these", "those", "my", "your",
    "his", "her", "its", "our", "their", "some", "any", "no", "every",
    "each", "either", "neither", "both", "all", "few", "many", "much",
    "several", "such", "what", "which", "whose", "another", "other")

  val Prepositions: Seq[String] = Seq(
    "in", "on", "at", "by", "for", "with", "about", "against",
    "between", "into", "through", "during", "before", "after", "above",
    "below", "to", "from", "up", "down", "of", "off", "over", "under",
    "near", "since", "until", "within", "without", "among", "across",
    "behind", "beyond", "around", "along", "toward", "towards", "upon",
    "onto", "per", "via", "despite", "throughout", "beside", "besides",
    "amid", "except")

  val Pronouns: Seq[String] = Seq(
    "i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
    "us", "them", "mine", "yours", "hers", "ours", "theirs", "myself",
    "yourself", "himself", "herself", "itself", "ourselves",
    "yourselves", "themselves", "who", "whom", "whose", "which", "what",
    "anyone", "everyone", "someone", "nobody", "anybody", "everybody",
    "somebody", "something", "anything", "everything", "nothing", "one")

  val Conjunctions: Seq[String] = Seq(
    "and", "or", "but", "nor", "so", "yet", "because", "although",
    "though", "while", "if", "unless", "since", "whereas", "whether",
    "once", "when", "whenever", "where", "wherever", "than", "that",
    "after", "before", "until", "as")

  val Auxiliaries: Seq[String] = Seq(
    "am", "is", "are", "was", "were", "be", "been", "being", "have",
    "has", "had", "having", "do", "does", "did", "will", "would",
    "shall", "should", "may", "might", "must", "can", "could", "ought")

  val ClosedAdverbs: Seq[String] = Seq(
    "very", "not", "never", "always", "often", "sometimes", "soon",
    "quite", "too", "also", "just", "still", "already", "again",
    "here", "there", "now", "then", "well", "almost", "rather",
    "perhaps", "maybe", "instead", "together", "away", "back", "even",
    "ever", "far", "fast", "hard", "late", "early", "today",
    "yesterday", "tomorrow")

  val Interjections: Seq[String] = Seq(
    "oh", "wow", "hey", "ouch", "oops", "hmm", "ah", "alas", "yay",
    "ugh", "hello", "hi", "bye", "please", "thanks", "yes", "no",
    "okay", "ok")

  val SpelledNumbers: Seq[String] = Seq(
    "zero", "one", "two", "three", "four", "five", "six", "seven",
    "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
    "fifteen", "sixteen", "seventeen", "eighteen", "nineteen",
    "twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty",
    "ninety", "hundred", "thousand", "million", "billion", "first",
    "second", "third", "fourth", "fifth", "dozen", "half")

  /** Every word the closed-class lexicons claim — the complement used
    * by the open-class noun heuristic.
    */
  val AllClosed: Seq[String] =
    (Determiners ++ Prepositions ++ Pronouns ++ Conjunctions ++
      Auxiliaries ++ ClosedAdverbs ++ Interjections ++ SpelledNumbers).distinct

  /** Case-insensitive whole-alternation over a lexicon. */
  private def alt(words: Seq[String]): String =
    words.mkString("(?i:", "|", ")")

  private val VerbSuffix = "(?i:\\w{2,}(?:ing|ed|ize|ise|ify|ates|ate))"
  private val AdjSuffix =
    "(?i:\\w+(?:ous|ful|ive|able|ible|ic|ical|ish|ary|less|est))"
  private val AdvSuffix = "(?i:\\w{3,}ly)"

  /** Open-class noun: a letter-initial word that is not a closed-class
    * word (bare digit runs are NUM, not NOUN). Deliberately permissive
    * — nouns are the open-class default, exactly as in coarse taggers.
    */
  private def nounRegex: String =
    s"(?!${alt(AllClosed)}(?!\\w))(?!\\d)\\w+"

  /** One POS class name → regex fragment (whole-token boundaries are
    * applied by the rule compiler, same as every matcher).
    */
  def regexFor(posClass: String): String = {
    val norm = posClass.trim.toLowerCase.replace(' ', '_')
    norm match {
      case "determiner" | "det" => alt(Determiners)
      case "preposition" | "adposition" | "adp" => alt(Prepositions)
      case "pronoun" | "pron" => alt(Pronouns)
      case "conjunction" | "cconj" | "sconj" | "conj" => alt(Conjunctions)
      case "auxiliary" | "aux" | "auxiliary_verb" => alt(Auxiliaries)
      case "interjection" | "intj" => alt(Interjections)
      case "number" | "num" | "numeral" =>
        s"(?:\\d+(?:\\.\\d+)?|${alt(SpelledNumbers)})"
      case "adverb" | "adv" => s"(?:${alt(ClosedAdverbs)}|$AdvSuffix)"
      case "verb" => s"(?:${alt(Auxiliaries)}|$VerbSuffix)"
      case "adjective" | "adj" => AdjSuffix
      case "proper_noun" | "propn" => "[A-Z][A-Za-z]+"
      case "noun" => nounRegex
      case _ => "\\w+" // unknown tag: AnyToken semantics, rule still loads
    }
  }
}
