package graft.extract

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExtractorsSpec extends SparkSpec {
  import spark.implicits._

  test("E2 glossary matches unigrams and bigrams, case-insensitive") {
    val df = Seq("Flights to New York and Paris from Boston").toDF("text")
    val out = df.select(Extractors.glossary($"text",
      Seq("new york", "paris", "london")).as("hits"))
      .as[Seq[String]].collect().head
    assert(out.toSet == Set("new york", "paris"))
  }

  test("E2 case_sensitive glossary distinguishes case; E10 bitcoin regex") {
    val df = Seq("Visited Paris and paris; paid to 1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa").toDF("text")
    val cs = df.select(Extractors.glossary($"text", Seq("Paris"), caseSensitive = true))
      .as[Seq[String]].collect().head
    assert(cs == Seq("Paris"))
    val ci = df.select(Extractors.glossary($"text", Seq("Paris")))
      .as[Seq[String]].collect().head
    assert(ci == Seq("paris")) // normalized, matches both
    val btc = df.select(Extractors.bitcoinAddresses($"text")).as[Seq[String]].collect().head
    assert(btc == Seq("1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa"))
  }

  test("E5 date battery parses multiple formats to one timestamp") {
    val df = Seq("2016-01-05", "01/05/2016", "Jan 5, 2016", "garbage")
      .toDF("d")
    val out = df.select(date_format(Extractors.parseDate($"d"), "yyyy-MM-dd").as("iso"))
      .as[String].collect()
    assert(out.toSeq == Seq("2016-01-05", "2016-01-05", "2016-01-05", null))
  }

  test("E6/E7 html all-text strip and title") {
    val html = "<html><head><title>My Page</title><style>p{}</style></head>" +
      "<body><p>Hello <b>world</b></p><script>var x=1;</script></body></html>"
    val df = Seq(html).toDF("raw")
    val row = df.select(
      Extractors.htmlAllText($"raw").as("text"),
      Extractors.htmlTitle($"raw").as("title")).collect().head
    assert(row.getString(0).replaceAll("\\s+", " ").contains("Hello world"))
    assert(!row.getString(0).contains("var x"))
    assert(row.getString(1) == "My Page")
  }

  test("E6 MAIN_CONTENT_STRICT keeps block text, drops nav boilerplate") {
    val html = "<html><body><nav>Home | About | Login</nav>" +
      "<p>Real article text here.</p><h2>Subhead</h2>" +
      "<ul><li>list item</li></ul><footer>copyright</footer></body></html>"
    val df = Seq(html).toDF("raw")
    val strict = df.select(Extractors.htmlMainContent($"raw")).as[String].collect().head
    assert(strict.contains("Real article text") && strict.contains("Subhead"))
    assert(!strict.contains("Login") && !strict.contains("copyright"))
    assert(!strict.contains("list item"))
    val relaxed = df.select(Extractors.htmlMainContent($"raw", relaxed = true))
      .as[String].collect().head
    assert(relaxed.contains("list item"))
  }

  test("E6 readability scoring picks the main container, drops link farms") {
    val html = "<html><body>" +
      "<div class=\"nav\"><p><a href=\"#\">Home</a>, <a href=\"#\">About</a>, <a href=\"#\">Products</a></p></div>" +
      "<div class=\"content\"><p>The exhibition opened in 1998, drawing record crowds, and critics praised it.</p>" +
      "<p>A second paragraph, with more detail, follows here.</p></div>" +
      "<div class=\"footer\"><p><a href=\"#\">Terms</a> <a href=\"#\">Privacy</a></p></div>" +
      "</body></html>"
    val strict = Seq(html).toDF("raw")
      .select(Extractors.htmlMainContent($"raw")).as[String].collect().head
    assert(strict.contains("exhibition") && strict.contains("second paragraph"))
    // the link-farm nav and footer score below the content container
    assert(!strict.contains("Home") && !strict.contains("Terms"))
  }

  test("E8 nonCapturing neutralizes rule groups; classes and escapes survive") {
    import LandmarkRules.nonCapturing
    assert(nonCapturing("<(b|strong)>") == "<(?:b|strong)>")
    assert(nonCapturing("[(]x") == "[(]x") // literal ( inside a class
    assert(nonCapturing("\\(z)") == "\\(z)") // escaped paren untouched
    assert(nonCapturing("\\\\(y)") == "\\\\(?:y)") // escaped backslash THEN a real group
    assert(nonCapturing("(?:a)(?=b)") == "(?:a)(?=b)") // already non-capturing
    assert(nonCapturing("(?<tag>b|i)") == "(?:b|i)") // named groups CAPTURE
    assert(nonCapturing("(?<=x)y(?<!z)") == "(?<=x)y(?<!z)") // lookbehinds don't
    // extraction with a grouped begin regex returns the SPAN, not the tag
    val rule = LandmarkRules.ItemRule("price-0-0", "<(b|strong)>price:", "</")
    val out = Seq("<div><b>price:42</div>").toDF("raw")
      .select(LandmarkRules.extract($"raw", rule)).as[String].collect().head
    assert(out == "42")
  }

  test("E8 landmark begin/end rule extracts the span; name maps to field") {
    val rule = Extractors.LandmarkRule("artist-1", "<h2>", "</h2>")
    assert(rule.field == "artist")
    val df = Seq("<div><h2>Monet</h2></div>").toDF("raw")
    assert(df.select(Extractors.landmark($"raw", rule)).as[String].collect().head == "Monet")
  }

  test("E9 hostname + tld") {
    val df = Seq("https://sub.example.org/page?q=1").toDF("url")
    val row = df.select(
      Extractors.hostname($"url"), Extractors.tld($"url")).collect().head
    assert(row.getString(0) == "sub.example.org")
    assert(row.getString(1) == "example.org")
  }

  test("E10 regex battery: emails, ips, cves") {
    val df = Seq("mail a@b.com ip 10.0.0.1 cve CVE-2021-44228 done").toDF("t")
    val row = df.select(
      Extractors.emails($"t"), Extractors.ipAddresses($"t"), Extractors.cveIds($"t"))
      .collect().head
    assert(row.getSeq[String](0) == Seq("a@b.com"))
    assert(row.getSeq[String](1) == Seq("10.0.0.1"))
    assert(row.getSeq[String](2) == Seq("CVE-2021-44228"))
  }

  test("toKgValues explodes extractions into long format with provenance") {
    val docs = Seq((1L, "fast join on big table")).toDF("doc_id", "text")
    val kg = Extractors.toKgValues(docs, "doc_id", Seq(
      ("op", Extractors.glossary($"text", Seq("join", "scan")), "dict", "content"),
      ("speed", Extractors.glossary($"text", Seq("fast", "slow")), "dict", "content")))
    val rows = kg.orderBy("field", "key").collect()
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("op", "join"), ("speed", "fast")))
    assert(rows.forall(_.getAs[String]("method") == "dict"))
    assert(rows.forall(_.getAs[Double]("confidence") == 1.0))
  }

  test("Dispatcher routes by selector and passes through unmatched docs") {
    val docs = Seq((1L, "src0", "a"), (2L, "src1", "b"), (3L, "other", "c"))
      .toDF("doc_id", "source", "text")
    val upper = new ExtractionModule {
      val name = "upper"
      val selector = col("source").startsWith("src")
      def transform(d: org.apache.spark.sql.DataFrame) =
        d.withColumn("text", upper(col("text")))
      private def upper(c: org.apache.spark.sql.Column) =
        org.apache.spark.sql.functions.upper(c)
    }
    val out = Dispatcher.run(docs, Seq(upper)).orderBy("doc_id")
    assert(out.select("text").as[String].collect().toSeq == Seq("A", "B", "c"))
  }

  test("E7 htmlAnnotations extracts microdata itemprop and RDFa property values") {
    val page =
      """<html><head>
        |<meta itemprop="datePublished" content="2018-02-02"/>
        |<meta content="The Met" itemprop="publisher"/>
        |<meta property="og:title" content="Vase Collection"/>
        |</head><body>
        |<div itemscope itemtype="http://schema.org/Painting">
        |  <span itemprop="name">The <b>Night</b> Watch</span>
        |  <a itemprop="url" href="/nw">link text</a>
        |</div>
        |</body></html>""".stripMargin
    val out = Seq(page).toDF("html")
      .select(explode(Extractors.htmlAnnotations(col("html"))).as("a"))
      .select("a.prop", "a.value")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.contains(("datePublished", "2018-02-02"))) // prop-then-content
    assert(out.contains(("publisher", "The Met"))) // content-then-prop
    assert(out.contains(("og:title", "Vase Collection"))) // RDFa property=
    assert(out.contains(("name", "The Night Watch"))) // container text, markup stripped
    assert(out.contains(("url", "link text")))
    // void-element values are not double-counted by the text form
    assert(out.count(_._1 == "datePublished") == 1)
  }

  test("E10 htmlTables parses a museum-style page into a cell grid") {
    val page =
      """<HTML><body><h1>Collection</h1>
        |<TABLE border="1" class="objects">
        |  <TR><TH scope="col"> Object </TH><th>Artist</th><th>Year</th></TR>
        |  <tr><td><a href="/o/1">Vase</a></td><td>  Unknown </td><td>1780</td></tr>
        |  <tr><td><b>Mask</b> (wood)</td><td><i>Attributed</i></td><td></td></tr>
        |</TABLE>
        |<p>no cells here</p>
        |<table><tr><td>footer</td></tr></table>
        |</body></HTML>""".stripMargin
    val out = Seq(page).toDF("html")
      .select(explode(Extractors.htmlTables(col("html"))).as("c"))
      .select("c.table_idx", "c.row_idx", "c.col_idx", "c.text")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.count(_._1 == 0) == 9)
    assert(out.contains((0, 0, 0, "Object")))
    assert(out.contains((0, 0, 2, "Year")))
    assert(out.contains((0, 1, 0, "Vase"))) // nested <a> stripped
    assert(out.contains((0, 1, 1, "Unknown"))) // whitespace collapsed
    assert(out.contains((0, 2, 0, "Mask (wood)"))) // mixed markup
    assert(out.contains((0, 2, 2, ""))) // empty cell kept (position matters)
    assert(out.contains((1, 0, 0, "footer"))) // second table indexed
  }

  test("Dispatcher plan size stays linear in module count (no 2^N doubling)") {
    val docs = Seq((1L, "src0", "a")).toDF("doc_id", "source", "text")
    def mod(n: String) = new ExtractionModule {
      val name = n
      val selector = col("source").startsWith("src")
      def transform(d: org.apache.spark.sql.DataFrame) =
        d.withColumn(n, org.apache.spark.sql.functions.lit(true))
    }
    val out = Dispatcher.run(docs, (1 to 6).map(i => mod(s"m$i")))
    // without the per-stage lineage barrier the logical plan embeds
    // 2^6 = 64 copies of the source; with it the plan stays shallow
    val planLines = out.queryExecution.logical.toString.linesIterator.size
    assert(planLines < 200, s"plan blew up: $planLines lines")
    assert(out.count() == 1)
    val r = out.collect().head
    assert((1 to 6).forall(i => r.getAs[Boolean](s"m$i")))
  }

  test("Dispatcher chains modules: a doc matching N modules is emitted once with all extractions") {
    val docs = Seq((1L, "src0", "a"), (2L, "other", "b")).toDF("doc_id", "source", "text")
    def mod(n: String, sel: org.apache.spark.sql.Column) = new ExtractionModule {
      val name = n
      val selector = sel
      def transform(d: org.apache.spark.sql.DataFrame) =
        d.withColumn(n, org.apache.spark.sql.functions.lit(true))
    }
    // doc 1 matches BOTH modules (etk_worker.py:102-105: each em whose
    // selector accepts the doc runs on the chained result)
    val out = Dispatcher.run(docs,
      Seq(mod("m1", col("source").startsWith("src")), mod("m2", col("doc_id") === 1)))
      .orderBy("doc_id")
    assert(out.count() == 2) // no duplication
    val r1 = out.filter(col("doc_id") === 1).collect().head
    assert(r1.getAs[Boolean]("m1") && r1.getAs[Boolean]("m2"))
    val r2 = out.filter(col("doc_id") === 2).collect().head
    assert(r2.isNullAt(r2.fieldIndex("m1")) && r2.isNullAt(r2.fieldIndex("m2")))
  }
}
