package graft.extract

import java.io.{BufferedInputStream, FileInputStream}
import java.util.zip.GZIPInputStream

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream

import graft.SparkSpec

/** Parity checks against the reference's OWN rule corpora (read-only
  * test inputs from /root/reference; SURVEY §7 "validate against the
  * museum rule corpus"). No reference code is used — only its data
  * files, loaded at test time.
  */
class ReferenceCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val Tarball =
    "/root/reference/sample-projects/museum/museum_20180202192943.tar.gz"

  private def readEntry(name: String): Option[String] = {
    val f = new java.io.File(Tarball)
    if (!f.exists()) return None
    val tin = new TarArchiveInputStream(
      new GZIPInputStream(new BufferedInputStream(new FileInputStream(f))))
    try {
      var e = tin.getNextEntry
      while (e != null) {
        if (e.getName == name) {
          val buf = new java.io.ByteArrayOutputStream()
          tin.transferTo(buf)
          return Some(buf.toString("UTF-8"))
        }
        e = tin.getNextEntry
      }
      None
    } finally tin.close()
  }

  test("E8: the full museum landmark corpus loads and every rule compiles") {
    val json = readEntry("landmark_rules/consolidated_rules.json")
    assume(json.isDefined, "museum tarball not available")
    val byTld = LandmarkRules.fromJson(json.get)
    assert(byTld.contains("si.edu"))
    val rules = byTld("si.edu")
    assert(rules.size >= 8)
    // every begin/end regex must be a valid Java pattern
    rules.foreach { r =>
      java.util.regex.Pattern.compile(s"(?s)${r.beginRegex}(.*?)${r.endRegex}")
    }
    assert(rules.map(_.field).toSet.intersect(
      Set("title", "name", "medium", "dimensions", "credit")).size >= 4)
  }

  test("E8: si.edu rules extract from an si.edu-shaped page") {
    val json = readEntry("landmark_rules/consolidated_rules.json")
    assume(json.isDefined)
    val rules = LandmarkRules.fromJson(json.get)("si.edu")
      .filter(r => Set("title-0-0").contains(r.name))
    // a minimal page satisfying title-0-0's begin/end anchors
    val page = "<script src='//www.google.com/recaptcha/api.js'></script>\n" +
      "<head><title>Starry Night by Vincent</title></head>"
    val df = Seq(page).toDF("raw")
    val out = LandmarkRules.applyRules(df, "raw", rules)
    val title = out.select("title").as[String].collect().head
    assert(title.contains("Starry Night"))
  }

  test("E3: the museum phone spacy rules load and extract phone numbers") {
    val json = readEntry("spacy_rules/phone.json")
    assume(json.isDefined)
    val rules = TokenRules.fromJson(json.get, "phone")
    assert(rules.nonEmpty)
    val df = Seq("call (555) 123 4567 today", "no phone").toDF("t")
    val hits = rules.map(r =>
      df.select(TokenRules.extract($"t", r).as("x")).as[Seq[String]].collect())
    // at least one rule extracts the number from row 0; no rule extracts
    // digits from the number-free row (rules using POS constraints —
    // outside our observed subset — degrade to AnyToken and may match
    // plain words, so the check is on digit extraction, not emptiness)
    assert(hits.exists(h => h(0).exists(_.replaceAll("\\D", "") == "5551234567")))
    assert(hits.forall(h => h(1).forall(v => v.replaceAll("\\D", "").isEmpty)))
  }

  test("E3: date_birth rules parse the corpus format") {
    val json = readEntry("spacy_rules/date_birth.json")
    assume(json.isDefined)
    val rules = TokenRules.fromJson(json.get, "date_birth")
    assert(rules.nonEmpty)
    rules.foreach(r => java.util.regex.Pattern.compile(TokenRules.compile(r)._1))
  }
}
