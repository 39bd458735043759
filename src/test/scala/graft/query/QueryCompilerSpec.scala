package graft.query

import graft.SparkSpec
import graft.query.QueryCompiler._

class QueryCompilerSpec extends SparkSpec {
  import spark.implicits._

  private def kg = Seq(
    ("d1", "country", "nigeria", "nigeria", "dict", "content", 1.0),
    ("d1", "city", "lagos", "lagos", "dict", "content", 1.0),
    ("d2", "country", "nigeria", "nigeria", "dict", "content", 1.0),
    ("d3", "city", "lagos", "lagos", "dict", "content", 1.0))
    .toDF("doc_id", "field", "value", "key", "method", "segment", "confidence")

  private def docs = Seq(
    ("d1", "nigeria lagos report"),
    ("d2", "nigeria summary"),
    ("d3", "lagos note")).toDF("doc_id", "text")

  private val catalog = Catalog(
    typeFieldMappings = Map(
      "country" -> TypeMapping(Seq("country" -> 10.0)),
      "city" -> TypeMapping(Seq("city" -> 3.0))),
    synonyms = Map("country" -> Map("naija" -> Seq("nigeria"))))

  test("Q4 AtLeastOneField per constraint, all constraints required") {
    val hits = QueryCompiler.search(kg, docs, "doc_id", "text",
      QuerySpec(Seq(Constraint("country", "nigeria"), Constraint("city", "lagos"))),
      catalog)
    assert(hits.select("doc_id").as[String].collect().toSeq == Seq("d1"))
  }

  test("Q6 weighted scoring + Q13 free-text token overlap") {
    val hits = QueryCompiler.search(kg, docs, "doc_id", "text",
      QuerySpec(Seq(Constraint("country", "nigeria")), freeText = Some("report summary")),
      catalog)
    val rows = hits.collect().map(r => (r.getString(0), r.getDouble(1)))
    // d1: 10 + 1 ("report"); d2: 10 + 1 ("summary") — tie broken by doc_id
    assert(rows.toSeq == Seq(("d1", 11.0), ("d2", 11.0)))
  }

  test("Q3/Q11 synonym expansion matches variant values") {
    val hits = QueryCompiler.search(kg, docs, "doc_id", "text",
      QuerySpec(Seq(Constraint("country", "naija"))), catalog)
    assert(hits.select("doc_id").as[String].collect().sorted.toSeq == Seq("d1", "d2"))
  }

  test("A2 facets over the hit set with rank") {
    val hits = QueryCompiler.search(kg, docs, "doc_id", "text",
      QuerySpec(Seq(Constraint("country", "nigeria"))), catalog)
    val f = QueryCompiler.facets(kg, hits, Seq("country", "city"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(f.toSet == Set(("country", "nigeria", 2L), ("city", "lagos", 1L)))
  }

  test("Q3 expanders: phone formats and height units") {
    val ph = QueryCompiler.Expanders.phone("+1 (555) 123-4567")
    assert(ph.contains("5551234567") && ph.contains("+15551234567") &&
      ph.contains("555-123-4567"))
    val h = QueryCompiler.Expanders.height("5'6\"")
    assert(h.contains("66in") && h.contains("168cm"))
    val h2 = QueryCompiler.Expanders.height("168 cm")
    assert(h2.contains("66in"))
    // catalog wiring: expander variants reach constraint matching
    val cat = Catalog(
      Map("phone" -> TypeMapping(Seq("phone" -> 1.0))),
      expanders = Map("phone" -> QueryCompiler.Expanders.phone))
    assert(cat.expand("phone", "(555) 123-4567").contains("5551234567"))
  }

  test("Q12 zone profile: alternate catalog weights rank strict above relaxed") {
    // zone model (zone_field_mappings.json): same field in two zones
    // with different weights — expressed as a second catalog profile
    val zoneKg = Seq(
      ("d1", "country.strict", "nigeria", "nigeria", "dict", "strict", 1.0),
      ("d2", "country.relaxed", "nigeria", "nigeria", "dict", "relaxed", 1.0))
      .toDF("doc_id", "field", "value", "key", "method", "segment", "confidence")
    val zoneCatalog = Catalog(Map(
      "country" -> TypeMapping(Seq("country.strict" -> 10.0, "country.relaxed" -> 2.0))))
    val hits = QueryCompiler.search(zoneKg, docs, "doc_id", "text",
      QuerySpec(Seq(Constraint("country", "nigeria"))), zoneCatalog)
    val rows = hits.collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("d1", 10.0), ("d2", 2.0))) // strict zone outranks
  }

  test("Q9 highlight extracts fragment around the term") {
    val frag = docs.select(QueryCompiler.highlight($"text", "lagos", 8).as("h"))
      .as[String].collect()
    assert(frag(0).contains("lagos"))
  }

  test("O1/Q6 BM25: hand-computed scores on a 3-doc corpus") {
    // N=3, avgdl=8/3; q = spark|stream; df(spark)=1, df(stream)=2
    // idf(spark)=ln(2.5/1.5+1); idf(stream)=ln(0.6+1)
    // dl=3 norm: tf + 1.2*(0.25 + 0.75*3/(8/3)) = tf + 1.3125
    val corpus = Seq(
      (1L, "spark spark stream"),
      (2L, "join the stream"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val out = QueryCompiler.bm25(corpus, "doc_id", "text", "spark stream")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // doc3 matches nothing
    val idfSpark = math.log(2.5 / 1.5 + 1)
    val idfStream = math.log(0.6 + 1)
    val exp1 = idfSpark * (2 * 2.2 / (2 + 1.3125)) + idfStream * (1 * 2.2 / (1 + 1.3125))
    val exp2 = idfStream * (1 * 2.2 / (1 + 1.3125))
    assert(math.abs(out(0)._2 - exp1) < 1e-3, s"${out(0)._2} vs $exp1")
    assert(math.abs(out(1)._2 - exp2) < 1e-3)
    assert(out(0)._3 == 2 && out(1)._3 == 1) // matched term counts
    // rarer term outranks at equal tf: idf(spark) > idf(stream)
    assert(idfSpark > idfStream)
  }
}
