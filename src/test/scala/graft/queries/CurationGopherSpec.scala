package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class CurationGopherSpec extends SparkSpec {
  import spark.implicits._

  private def mode(xs: Seq[String]): (Int, String) = {
    val r = Seq(xs).toDF("a")
      .select(TextFunctions.modeOf(col("a")).as("m"))
      .select(col("m.cnt"), col("m.gram")).head()
    (r.getInt(0), r.getString(1))
  }

  test("modeOf: most frequent element, ties to lexicographically smallest") {
    assert(mode(Seq("b", "a", "b", "c", "a", "b")) == (3, "b"))
    assert(mode(Seq("b", "a")) == (1, "a")) // tie -> smallest
    assert(mode(Seq("z")) == (1, "z"))
    assert(mode(Seq.empty) == (0, ""))
  }

  test("textGopher: repeated bigram dominates and fraction is exact") {
    val docs = Seq((1L, "spam ham spam ham spam ham"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        explode(graft.plans.NativeExpressions.topNgrams(col("text"), 2, 4)).as("e"))
      .select(col("doc_id"), col("e.n"), col("e.gram"), col("e.cnt"), col("e.frac"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getString(2), r.getInt(3), r.getDouble(4))))
      .toMap
    // doc 1: "spam ham" occurs 3x of 5 bigrams; text = 26 chars
    assert(out((1L, 2)) == (("ham spam", 2, 2.0 * 8 / 26)) ||
      out((1L, 2)) == (("spam ham", 3, 3.0 * 8 / 26)))
    assert(out((1L, 2))._2 == 3 && out((1L, 2))._1 == "spam ham")
    // doc 2: all distinct -> cnt 1, smallest bigram
    assert(out((2L, 2)) == (("a b", 1, 3.0 / 9)))
    assert(out((2L, 4)) == (("a b c d", 1, 7.0 / 9)))
    // doc 1 trigram: "spam ham spam" x2 of 4 (overlapping count)
    assert(out((1L, 3))._2 == 2)
  }

  test("native TopNgrams == composed modeOf/shinglesOf HOF over the corpus") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val native = docs.select(col("doc_id"),
        explode(graft.plans.NativeExpressions.topNgrams(col("text"), 2, 4)).as("e"))
      .select(col("doc_id"), col("e.n"), col("e.gram"), col("e.cnt"), col("e.frac"))
      .orderBy(col("doc_id"), col("e.n")).collect().toSeq
    val hof = docs.select(col("doc_id"), explode(CurationQueries.gopherEntriesHof).as("e"))
      .select(col("doc_id"), col("e.n"), col("e.gram"), col("e.cnt"), col("e.frac"))
      .orderBy(col("doc_id"), col("e.n")).collect().toSeq
    assert(native == hof) // includes bit-equality of the frac doubles
  }

  test("bpePieces: GPT-2-style pretokenizer splits on the documented arms") {
    def pieces(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextFunctions.bpePieces(col("t"))).as[Seq[String]].head()
    // contractions split; space prefixes attach to the following piece
    assert(pieces("it's John's fault") ==
      Seq("it", "'s", " John", "'s", " fault"))
    // digits and punctuation are separate space-prefixed runs; a
    // multi-space run is consumed whole by the greedy whitespace arm
    // (the documented divergence from GPT-2's \s+(?!\S) lookahead,
    // which would leave the last space to prefix "beats")
    assert(pieces("v2.0  beats v1") ==
      Seq("v", "2", ".", "0", "  ", "beats", " v", "1"))
    // case preserved (unlike the lowercasing whitespace counter)
    assert(pieces("Hello WORLD") == Seq("Hello", " WORLD"))
    assert(pieces("") == Seq.empty)
    // vertical tab U+000B is NOT in the explicit whitespace class (Java
    // \s contains it, RE2's does not — the pattern avoids \s so both
    // engines route it to the punctuation arm)
    assert(pieces("a\u000bb") == Seq("a", "\u000b", "b"))
  }

  test("canonicalizeUrl: case, www, ports, tracking params, order, fragment, slash") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(TextFunctions.canonicalizeUrl(col("u"))).as[String].head()
    assert(canon("HTTPS://WWW.Ex.Org:443/Doc/1/?utm_source=x&b=2&a=1#f") ==
      "https://ex.org/Doc/1?a=1&b=2")
    assert(canon("http://ex.org:80/p?fbclid=z&z=9&gclid=q") == "http://ex.org/p?z=9")
    // path case preserved; no query -> no '?'
    assert(canon("https://EX.org/CaseSensitive") == "https://ex.org/CaseSensitive")
    // www stripped only as a prefix label
    assert(canon("https://wwwx.org/a") == "https://wwwx.org/a")
    // non-default port kept
    assert(canon("https://ex.org:8443/a") == "https://ex.org:8443/a")
  }

  test("pipelineStats: exact type-1 percentiles match a sort-based reference") {
    val df = CurationQueries.pipelineStats(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // reference: collect per-source sorted token counts, pick by rank
    val counts = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"),
        graft.plans.NativeExpressions.textStats(col("text")).getField("n_tok").as("nt"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2.toLong).sorted) }
    counts.foreach { case (src, sorted) =>
      def pick(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
      val (nDocs, total, p50, p90, p99) = df(src)
      assert(nDocs == sorted.length && total == sorted.sum)
      assert((p50, p90, p99) == ((pick(0.5), pick(0.9), pick(0.99))), s"source $src")
    }
  }

  test("textGopher over the corpus matches a groupBy-explode reference") {
    val df = CurationQueries.textGopher(spark, "/root/testdata/sf0.001")
    // reference formulation: explode + groupBy + window (the shuffle
    // shape textGopher's per-row fold avoids)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val refRows = (2 to 4).map { n =>
      docs.select(col("doc_id"),
          length(array_join(TextFunctions.tokens(col("text")), " ")).as("dn"),
          explode(TextFunctions.shinglesOf(TextFunctions.tokens(col("text")), n)).as("gram"))
        .groupBy(col("doc_id"), col("dn"), col("gram")).agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
            .orderBy(col("cnt").desc, col("gram"))))
        .filter(col("rk") === 1)
        .select(col("doc_id"), lit(n).as("n"), col("gram"), col("cnt").cast("int").as("cnt"),
          ((col("cnt") * length(col("gram"))).cast("double") / col("dn").cast("double")).as("frac"))
    }.reduce(_ unionAll _)
    val exp = refRows.orderBy(col("doc_id"), col("n")).collect().toSeq
    val got = df.collect().toSeq
    assert(got == exp)
  }
}
