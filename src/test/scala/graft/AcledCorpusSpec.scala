package graft

import org.apache.spark.sql.functions._

import graft.extract.Extractors
import graft.operators.KgOps
import graft.sources.Sources

/** The reference's structured event corpora (datasets/events/acled.jl,
  * pitf.jl; SURVEY §1.1 schema plane): dynamic per-dataset schemas with
  * nested actors, multi-dataset union-by-name with missing columns
  * (§2.8), ISO date parsing (E5), and actor node-splitting (E11/J2).
  */
class AcledCorpusSpec extends SparkSpec {

  private val Acled = "/root/reference/datasets/events/acled.jl"
  private val Pitf = "/root/reference/datasets/events/pitf.jl"

  private def available = new java.io.File(Acled).exists() &&
    new java.io.File(Pitf).exists()

  test("dynamic schemas: both corpora ingest with their own shapes") {
    assume(available, "event corpora not available")
    val acled = Sources.jsonLines(spark, Acled)
    val pitf = Sources.jsonLines(spark, Pitf)
    assert(acled.count() == 100 && pitf.count() == 100)
    assert(acled.columns.contains("death_count"))
    assert(pitf.columns.contains("injured_count")) // pitf-only field
    assert(!acled.columns.contains("injured_count"))
  }

  test("§2.8 union-by-name with missing columns merges the datasets") {
    assume(available)
    val acled = Sources.jsonLines(spark, Acled).withColumn("dataset", lit("acled"))
    val pitf = Sources.jsonLines(spark, Pitf).withColumn("dataset", lit("pitf"))
    val all = acled.unionByName(pitf, allowMissingColumns = true)
    assert(all.count() == 200)
    // acled rows carry null injured_count after the union
    assert(all.filter(col("dataset") === "acled" && col("injured_count").isNotNull).count() == 0)
  }

  test("E5 date battery parses every event_date to a timestamp") {
    assume(available)
    val acled = Sources.jsonLines(spark, Acled)
    val parsed = acled.select(
      Extractors.parseDate(col("event_date")).as("ts"), col("event_date"))
    assert(parsed.filter(col("ts").isNull && col("event_date").isNotNull).count() == 0)
    val years = parsed.select(year(col("ts"))).distinct()
      .collect().map(_.getInt(0))
    assert(years.forall(y => y >= 1990 && y <= 2020))
  }

  test("E11 node split promotes actors to child docs with parent FK") {
    assume(available)
    val acled = Sources.jsonLines(spark, Acled)
    val withActors = acled.filter(size(col("actors")) > 0)
    val children = KgOps.nodeSplit(withActors, "doc_id", "actors", "acled/actors")
    assert(children.count() >=  withActors.count()) // >=1 actor per doc
    assert(children.columns.contains("parent_doc_id"))
    // every child re-joins its parent (J2)
    val joined = children.join(
      acled.select(col("doc_id").as("parent_doc_id")), "parent_doc_id")
    assert(joined.count() == children.count())
  }
}
