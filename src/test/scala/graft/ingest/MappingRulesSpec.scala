package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ports the reference's unit-test semantics (SURVEY §5):
  * test_decode_dict.py (mapped / unmapped-preserve / unmapped-delete),
  * test_cell_values_deletion.py (delete-by-value), plus the template,
  * guard, nest, and blank-removal rules.
  */
class MappingRulesSpec extends SparkSpec {
  import spark.implicits._

  private def cells = Seq(
    ("r1", "A", "keep"),
    ("r2", "NULL", "x"),
    ("r3", "", "  pad  "),
    ("r4", "B", "DEL")).toDF("id", "c1", "c2")

  test("P7 delete-by-value nulls blacklisted cells only") {
    val out = MappingRules.deleteValues(Map("c1" -> Seq("NULL"), "c2" -> Seq("DEL")))(cells)
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("A", null, "", "B"))
    assert(rows.map(_.getString(2)).toSeq == Seq("keep", "x", "  pad  ", null))
  }

  test("P8 decode_dict maps values; unmapped preserved by default") {
    val out = MappingRules.decodeDict("c1", Map("A" -> "alpha", "NULL" -> "n/a"))(cells)
    assert(out.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("alpha", "n/a", "", "B"))
  }

  test("P8 decode_dict default_action=delete nulls unmapped values") {
    val out = MappingRules.decodeDict("c1", Map("A" -> "alpha"), defaultPreserve = false)(cells)
    assert(out.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("alpha", null, null, null))
  }

  test("P8 broadcast-join variant matches the when-chain") {
    val dict = Seq(("A", "alpha"), ("NULL", "n/a")).toDF("k", "v")
    val a = MappingRules.decodeDict("c1", Map("A" -> "alpha", "NULL" -> "n/a"))(cells)
    val b = MappingRules.decodeDictJoin("c1", dict)(cells)
    assert(a.orderBy("id").collect().toSeq == b.orderBy("id").collect().toSeq)
  }

  test("P5/P6 trim + blank-to-null") {
    val out = MappingRules.blankToNull(MappingRules.trimWhitespace(cells))
    val r3 = out.filter($"id" === "r3").collect().head
    assert(r3.getString(1) == null) // "" -> null
    assert(r3.getString(2) == "pad") // trimmed
  }

  test("P9 template substitutes refs, missing/null -> empty") {
    val df = Seq(("b1", "t1"), ("b2", null)).toDF("brand", "typ")
    val out = MappingRules.template("title", "brand {brand} typ {typ} end {missing}!")(df)
    assert(out.orderBy("brand").collect().map(_.getString(2)).toSeq ==
      Seq("brand b1 typ t1 end !", "brand b2 typ  end !"))
  }

  test("P11 all guards must pass") {
    val out = MappingRules.guards(Seq("c1" -> "^[AB]$", "c2" -> "keep|DEL"))(cells)
    assert(out.select("id").as[String].collect().sorted.toSeq == Seq("r1", "r4"))
  }

  test("P12 nest groups columns into a struct, leftovers stay top-level") {
    val out = MappingRules.nest("sub", Seq("c1", "c2"))(cells)
    assert(out.columns.toSeq == Seq("id", "sub"))
    assert(out.select("sub.c1").orderBy("id").collect().head.getString(0) == "A")
  }

  test("P16 default field-name mapping") {
    assert(MappingRules.defaultFieldName("B 1") == "b_1")
    assert(MappingRules.defaultFieldName("B-2!") == "b_2")
    assert(MappingRules.defaultFieldName("Plain") == "plain")
  }

  test("P1 promoteHeaderRow takes row N as names, drops preamble") {
    val df = Seq(
      ("1", "junk", "preamble"),
      ("2", "name", "age"),
      ("3", "ada", "36"),
      ("4", "alan", "41")).toDF("seq", "x", "y")
    val out = MappingRules.promoteHeaderRow(2, Seq($"seq"))(df)
    assert(out.columns.toSeq == Seq("2", "name", "age")) // seq cell "2" is the name col 1
    assert(out.count() == 2)
    assert(out.select("name").as[String].collect().sorted.toSeq == Seq("ada", "alan"))
  }

  test("P3 positional column slice renames to 1..n") {
    val out = MappingRules.columnSlice(1, 3)(cells)
    assert(out.columns.toSeq == Seq("1", "2"))
  }

  test("P13 synthesizeIdentity: urls unique across multi-column partition keys") {
    // row numbers restart per (file, batch) partition — the tag must
    // key on BOTH columns or two batches would mint url "...#1" twice
    val df = Seq(
      ("", "b1", 10), ("", "b1", 11),
      ("", "b2", 20), ("", "b2", 21)).toDF("file", "batch", "ord")
    val out = MappingRules.synthesizeIdentity("u", Seq($"ord"),
      perFile = Seq($"file", $"batch"))(df)
    val urls = out.select("url").as[String].collect()
    assert(urls.distinct.length == 4, s"duplicate urls: ${urls.mkString(", ")}")
    // single empty-string key (the in-memory default shape): no tag
    val plain = MappingRules.synthesizeIdentity("u", Seq($"ord"),
      perFile = Seq(lit("")))(df.select($"ord"))
    assert(plain.select("url").as[String].collect().toSet ==
      Set("u#1", "u#2", "u#3", "u#4"))
  }

  test("P13 single-file upload keeps the reference's plain base#N ids") {
    // ADVICE r2: the partition tag must not fire for the common
    // single-file case (reference: running counter per uploaded file,
    // dig_tabular_import.py:358-366)
    val dir = java.nio.file.Files.createTempDirectory("ident").toFile
    val f1 = new java.io.File(dir, "a.csv")
    java.nio.file.Files.write(f1.toPath, "ord\n1\n2\n3\n".getBytes)
    val one = spark.read.option("header", "true").csv(f1.toString)
    val out = MappingRules.synthesizeIdentity("u", Seq($"ord"))(one)
    assert(out.select("url").as[String].collect().toSet ==
      Set("u#1", "u#2", "u#3"))
    // two files: tag returns (per-file counters restart, so plain #N
    // would collide) and urls stay unique
    val f2 = new java.io.File(dir, "b.csv")
    java.nio.file.Files.write(f2.toPath, "ord\n1\n2\n".getBytes)
    val two = spark.read.option("header", "true").csv(dir.toString)
    val urls = MappingRules.synthesizeIdentity("u", Seq($"ord"))(two)
      .select("url").as[String].collect()
    assert(urls.length == 5 && urls.distinct.length == 5)
    assert(urls.forall(_.matches("u#[0-9a-f]{8}-\\d+")))
  }
}
