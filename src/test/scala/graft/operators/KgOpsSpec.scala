package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KgOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    ("d1", "pr", Seq(("o1", "t1"), ("o2", "t2"))),
    ("d2", "other", Seq(("o3", "t3"))))
    .toDF("doc_id", "dataset_identifier", "orgs")
    .withColumn("orgs", $"orgs".cast("array<struct<id:string,title:string>>"))

  test("E11/J2 nodeSplit promotes nested objects to child docs with parent FK") {
    val children = KgOps.nodeSplit(docs, "doc_id", "orgs", "pr/orgs")
    assert(children.count() == 3)
    val row = children.filter($"id" === "o1").collect().head
    assert(row.getAs[String]("parent_doc_id") == "d1")
    assert(row.getAs[String]("dataset_identifier") == "pr/orgs")
    assert(row.getAs[String]("doc_id").length == 64)
    // re-join child to parent (J2)
    val joined = children.join(docs.select($"doc_id".as("parent_doc_id"), $"dataset_identifier".as("pd")),
      "parent_doc_id")
    assert(joined.count() == 3)
  }

  test("E12 enhancement: priority order + guard on dataset_identifier") {
    val out = KgOps.enhance(docs, Seq(
      KgOps.Enhancement("kind", "privacy", Some("pr")),
      KgOps.Enhancement("kind", "generic", None))) // lower priority
    val m = out.select("doc_id", "kind").as[(String, String)].collect().toMap
    assert(m("d1") == "privacy") // guard matched, first rule wins
    assert(m("d2") == "generic") // fallback fills the null
  }

  test("J1 joinIndexing hoists child fields to top-level searchable columns") {
    val nested = Seq(("d1", ("big", "flood"))).toDF("doc_id", "damage")
      .withColumn("damage", $"damage".cast("struct<size:string,cause:string>"))
    val out = KgOps.joinIndexing(nested, "damage", Seq("size", "cause"))
    assert(out.columns.toSet.contains("damage__size"))
    assert(out.select("damage__size").as[String].collect().head == "big")
  }

  test("Q2 normalizer whitelist (no eval)") {
    assert(KgOps.normalize(Seq("lower", "strip_stopwords"))("The Big Table OF data") ==
      "big table data")
    assert(KgOps.normalize(Seq("digits_only"))("+1 (555) 123-4567") == "15551234567")
  }
}
