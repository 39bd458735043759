package graft

import java.io.{BufferedInputStream, FileInputStream}
import java.util.zip.GZIPInputStream

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.functions._

import graft.extract.Extractors
import graft.query.QueryCompiler
import graft.query.QueryCompiler.{Catalog, Constraint, QuerySpec, TypeMapping}

/** The reference's own end-to-end demo (docs/index.md:87-141; SURVEY §7
  * "minimum end-to-end slice") run on the reference's own corpus:
  * load datasets/elicit_20.jl (20 real HTML event pages) → HTML
  * content/title extraction (E6/E7) → country/city glossary KG (E2,
  * glossaries from the elicit project tarball) → structured query
  * Country=nigeria → ranked docs + facets.
  */
class ElicitDemoSpec extends SparkSpec {
  import spark.implicits._

  private val Corpus = "/root/reference/datasets/elicit_20.jl"
  private val Tarball = "/root/reference/datasets/elicit_20181113185140.tar.gz"

  private def glossaryFromTar(name: String): Option[Seq[String]] = {
    val f = new java.io.File(Tarball)
    if (!f.exists()) return None
    val tin = new TarArchiveInputStream(
      new GZIPInputStream(new BufferedInputStream(new FileInputStream(f))))
    try {
      var e = tin.getNextEntry
      while (e != null) {
        if (e.getName.endsWith(s"glossaries/$name")) {
          val buf = new java.io.ByteArrayOutputStream()
          tin.transferTo(buf)
          return Some(buf.toString("UTF-8").split("\n").map(_.trim)
            .filter(_.nonEmpty).toSeq)
        }
        e = tin.getNextEntry
      }
      None
    } finally tin.close()
  }

  test("reference demo: elicit_20 -> KG -> Country=nigeria query") {
    assume(new java.io.File(Corpus).exists(), "elicit corpus not available")
    val countries = glossaryFromTar("countries.txt")
    val cities = glossaryFromTar("cities.txt")
    assume(countries.isDefined && cities.isDefined, "glossaries not available")

    // ingest (S1) + extraction plane (E6/E7/E2)
    val docs = sources.Sources.jsonLines(spark, Corpus)
      .withColumn("content", Extractors.htmlAllText(col("raw_content")))
      .withColumn("title", Extractors.htmlTitle(col("raw_content")))
      .cache()
    assert(docs.count() == 20)

    val kg = Extractors.toKgValues(docs, "doc_id", Seq(
      ("country", Extractors.glossary(col("content"), countries.get),
        "extract_using_dictionary", "content_strict"),
      ("city", Extractors.glossary(col("content"), cities.get.take(5000)),
        "extract_using_dictionary", "content_strict"),
      ("title", array(Extractors.htmlTitle(col("raw_content"))), "extract_as_is", "title")))
      .cache()
    assert(kg.filter(col("field") === "country").count() > 0)

    // the docs' own demo query: Country = nigeria finds event pages
    val catalog = Catalog(Map(
      "country" -> TypeMapping(Seq("country" -> 10.0)),
      "city" -> TypeMapping(Seq("city" -> 3.0))))
    val hits = QueryCompiler.search(kg, docs, "doc_id", "content",
      QuerySpec(Seq(Constraint("country", "nigeria"))), catalog)
    val n = hits.count()
    assert(n > 0 && n <= 20, s"expected some nigeria docs, got $n")

    // facets over the hit set (the UI's country/city term aggs)
    val facets = QueryCompiler.facets(kg, hits, Seq("country", "city"))
    val topCountry = facets.filter(col("field") === "country")
      .orderBy(col("rank")).select("key").as[String].collect()
    assert(topCountry.contains("nigeria"))
  }
}
