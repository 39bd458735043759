package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Dataset-curation operators a large-scale training-data pipeline
  * needs beyond cleaning/dedup (builder brief): deterministic split
  * assignment, intra-document repetition scoring, and benchmark
  * contamination flagging. All narrow maps + one aggregation/join —
  * the 100 TB shapes match the dedup family they reuse.
  */
object CurationQueries {

  /** Deterministic train/valid/test split by content-independent hash
    * of the document id (90/5/5): reproducible across engines, runs,
    * and partitionings — never `rand()`. Emits per-language split
    * counts (the sanity report a pipeline checks before training).
    */
  def pipelineSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      conv(substr(md5(col("doc_id").cast("string")), lit(1), lit(8)), 16, 10).cast("long"),
      lit(100))
    val split = when(bucket < 90, "train").when(bucket < 95, "valid").otherwise("test")
    Tables(s, dir, "documents")
      .select(col("lang"), split.as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("docs"))
      .orderBy(col("lang"), col("split"))
  }

  val pipelineSplitSql: String =
    """SELECT lang,
      |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid' ELSE 'test' END AS split,
      |  COUNT(*) AS docs
      |FROM (SELECT lang,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
      |  FROM documents)
      |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** Gopher-style repetition signal: fraction of duplicate token
    * 3-grams within each document (high value = boilerplate/spam).
    * Top-50 most repetitive docs.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    // bindOnce: total and uniq both reference the shingle array — an
    // unbound reference re-runs the whole tokenize+zip_with subtree
    // per use (the CollapseProject trap)
    val counts = TextFunctions.bindOnce(TextFunctions.shingles(col("text"))) { sh =>
      struct(size(sh).as("total"), size(array_distinct(sh)).as("uniq"))
    }
    Tables(s, dir, "documents")
      .select(col("doc_id"), counts.as("c"))
      .select(col("doc_id"), col("c.total").as("total"), col("c.uniq").as("uniq"))
      .filter(col("total") > 0)
      .withColumn("rep",
        (col("total") - col("uniq")).cast("double") / col("total").cast("double"))
      .select(col("doc_id"), col("total"), col("uniq"), col("rep"))
      .orderBy(col("rep").desc, col("doc_id"))
      .limit(50)
  }

  val textRepetitionSql: String =
    """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'[a-z0-9]+') AS t FROM documents),
      |sh AS (SELECT doc_id, list_transform(range(greatest(len(t)-2, 0)),
      |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) AS s FROM tk)
      |SELECT doc_id, len(s) AS total, len(list_distinct(s)) AS uniq,
      |  CAST(len(s) - len(list_distinct(s)) AS DOUBLE) / CAST(len(s) AS DOUBLE) AS rep
      |FROM sh WHERE len(s) > 0
      |ORDER BY rep DESC, doc_id LIMIT 50""".stripMargin

  /** Benchmark-contamination flagging: corpus docs sharing >= minShared
    * distinct 3-gram shingles with ANY benchmark document must be
    * dropped before training. Benchmark here = the deterministic
    * doc_id % 20 == 0 subset standing in for an eval set; the operator
    * shape (distinct benchmark shingle set, semi-join via the inverted
    * index, per-doc overlap count) is the real thing — the benchmark
    * side is small and broadcastable at any corpus scale.
    */
  def contamination(s: SparkSession, dir: String, minShared: Int = 3): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), array_distinct(TextFunctions.shingles(col("text"))).as("sh"))
    val isBench = (col("doc_id") % lit(20)) === 0
    val benchShingles = broadcast(
      docs.filter(isBench).select(explode(col("sh")).as("s")).distinct())
    docs.filter(!isBench)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .join(benchShingles, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared")) // sh pre-distinct -> count = distinct overlap
      .filter(col("shared") >= minShared)
      .orderBy(col("shared").desc, col("doc_id"))
  }

  val contaminationSql: String =
    """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'[a-z0-9]+') AS t FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(greatest(len(t)-2, 0)),
      |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS s FROM tk),
      |bench AS (SELECT DISTINCT unnest(s) AS x FROM sh WHERE doc_id % 20 = 0),
      |inv AS (SELECT doc_id, unnest(s) AS x FROM sh WHERE doc_id % 20 <> 0)
      |SELECT doc_id, COUNT(*) AS shared
      |FROM inv JOIN bench USING (x)
      |GROUP BY doc_id HAVING COUNT(*) >= 3
      |ORDER BY shared DESC, doc_id""".stripMargin

  /** PII redaction: emails and IPv4 literals replaced with typed
    * placeholder tags before training. Patterns stay in the Java∩RE2
    * subset so the DuckDB oracle matches byte-for-byte; the corpus has
    * no PII, so each document gets deterministic synthetic PII derived
    * from its row (the oracle re-derives the same), and the check
    * hashes the redacted text. Narrow map — the 100 TB shape is a scan.
    */
  private val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpRx = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  def textRedact(s: SparkSession, dir: String): DataFrame = {
    val withPii0 = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com"),
      lit(" from 10.0."), (col("doc_id") % lit(256)).cast("string"), lit(".7"))
    // bindOnce: the synthetic-PII string feeds three regex consumers —
    // unbound, the concat re-materializes per consumer
    val cols = TextFunctions.bindOnce(withPii0) { withPii =>
      val redacted = regexp_replace(
        regexp_replace(withPii, EmailRx, "<EMAIL>"), IpRx, "<IP>")
      struct(
        size(regexp_extract_all(withPii, lit(EmailRx), lit(0))).as("n_email"),
        size(regexp_extract_all(withPii, lit(IpRx), lit(0))).as("n_ip"),
        sha2(redacted, 256).as("redacted_hash"))
    }
    Tables(s, dir, "documents")
      .select(col("doc_id"), cols.as("c"))
      .select(col("doc_id"), col("c.n_email").as("n_email"),
        col("c.n_ip").as("n_ip"), col("c.redacted_hash").as("redacted_hash"))
      .orderBy(col("doc_id"))
  }

  val textRedactSql: String = {
    val pii = "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'" +
      " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    s"""SELECT doc_id,
       |  len(regexp_extract_all($pii, '$EmailRx')) AS n_email,
       |  len(regexp_extract_all($pii, '$IpRx')) AS n_ip,
       |  sha256(regexp_replace(regexp_replace($pii, '$EmailRx', '<EMAIL>', 'g'),
       |    '$IpRx', '<IP>', 'g')) AS redacted_hash
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** CCNet-style unigram-LM quality signal: per-document cross-entropy
    * under the corpus's own unigram model — mean over token positions
    * of −ln p(token), p = corpus count / total tokens. Unusual/garbled
    * documents score high, boilerplate scores low; CCNet buckets its
    * corpus by exactly this statistic (with a wiki-trained 5-gram LM —
    * the model is pluggable, the pipeline shape is this one).
    *
    * Scale shape: the classic LM-scoring topology — wordcount over the
    * corpus (vocabulary-sized shuffle), token→logp join back, per-doc
    * aggregation. Cross-engine exactness WITHOUT rounding: per-doc
    * contributions are folded in token-POSITION order (sort_array of
    * (pos, lp) structs + sequential `aggregate`), the same
    * left-to-right IEEE order as the DuckDB oracle's ordered `list()`
    * + `list_reduce` — the dot-product determinism trick applied to
    * log-probs.
    */
  def textPerplexity(s: SparkSession, dir: String): DataFrame = {
    // The token table is consumed three times (vocabulary groupBy,
    // total count, per-doc join) but deliberately NOT cached: the
    // scan+tokenize+explode is a cheap narrow pipeline, and caching
    // the exploded table measured SLOWER than recompute at sf0.1
    // (2.4s -> 3.1s — materialization cost exceeds three pipelined
    // recomputes). At 100 TB the same call writes the token table to
    // storage once (the standard LM-scoring topology); the in-memory
    // cache barrier is the wrong mechanism at either scale.
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).cast("double").as("total"))
    val perDoc = toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .withColumn("lp", -log(col("cnt").cast("double") / col("total")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("lp")))).as("arr"),
        count(lit(1)).as("n_tokens"))
      .withColumn("cross_entropy",
        aggregate(col("arr"), lit(0.0), (acc, x) => acc + x.getField("lp")) / col("n_tokens"))
    perDoc.select(col("doc_id"), col("n_tokens"), col("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  val textPerplexitySql: String =
    """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      |tks AS (SELECT doc_id, u.pos, u.tok FROM tk,
      |  UNNEST(list_transform(range(len(t)), i -> struct_pack(pos := i, tok := t[i+1]))) AS s(u)),
      |vocab AS (SELECT tok, COUNT(*) AS cnt FROM tks GROUP BY tok),
      |total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM tks)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  list_reduce(list(-ln(CAST(cnt AS DOUBLE) / total) ORDER BY pos), (x, y) -> x + y)
      |    / COUNT(*) AS cross_entropy
      |FROM tks JOIN vocab USING (tok) CROSS JOIN total
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Gopher-style top-n-gram repetition panel (Rae et al. 2021, §A1.1):
    * for n in 2..4, the most frequent token n-gram per document and the
    * fraction of the document's characters its (overlapping)
    * occurrences cover — the "fraction of characters in the most
    * common n-gram" filter family. Character base = the space-joined
    * token stream, so the score is tokenizer-stable; overlapping
    * occurrences are counted as-is (the standard approximation — the
    * score is a monotone repetition signal, not an exact cover).
    *
    * Scale shape: one narrow map per document ([[TextFunctions.modeOf]]
    * is a per-row sort + linear fold — NO n-gram explode/shuffle,
    * unlike the naive groupBy(doc, gram) formulation whose shuffle
    * volume is the corpus re-keyed by every n-gram occurrence).
    */
  def textGopher(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.plans.NativeExpressions.topNgrams(col("text"), 2, 4)).as("e"))
      .select(col("doc_id"), col("e.n").as("n"), col("e.gram").as("gram"),
        col("e.cnt").as("cnt"), col("e.frac").as("frac"))
      .orderBy(col("doc_id"), col("n"))

  /** Composed-HOF reference formulation of [[textGopher]]'s per-row
    * kernel (modeOf over shinglesOf per n) — kept for the parity spec;
    * the query uses the native TopNgrams expression (HOF aggregate/
    * array_sort are CodegenFallback — interpreted per element).
    */
  def gopherEntriesHof: Column = {
    TextFunctions.bindOnce(TextFunctions.tokens(col("text"))) { t =>
      TextFunctions.bindOnce(length(array_join(t, " "))) { dn =>
        val perN = (2 to 4).map { n =>
          TextFunctions.bindOnce(TextFunctions.modeOf(TextFunctions.shinglesOf(t, n))) { m =>
            struct(lit(n).as("n"), m.getField("gram").as("gram"),
              m.getField("cnt").as("cnt"),
              // long product before the divide, matching the native
              // kernel and the oracle's BIGINT cnt*length
              ((m.getField("cnt").cast("long") * length(m.getField("gram"))).cast("double")
                / dn.cast("double")).as("frac"))
          }
        }
        filter(array(perN: _*), e => e.getField("cnt") > 0)
      }
    }
  }

  val textGopherSql: String = {
    val shingleN = (n: Int) =>
      s"list_transform(range(greatest(len(t)-${n - 1},0)), i -> " +
        (1 to n).map(k => s"t[i+$k]").mkString(" || ' ' || ") + ")"
    val arms = (2 to 4).map(n =>
      s"SELECT doc_id, t, $n AS n, ${shingleN(n)} AS sh FROM tk")
      .mkString("\n  UNION ALL ")
    s"""WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'[a-z0-9]+') AS t FROM documents),
       |g AS (SELECT doc_id, n, length(array_to_string(t, ' ')) AS dn, unnest(sh) AS gram
       |  FROM (\n  $arms)),
       |c AS (SELECT doc_id, n, gram, dn, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3, 4),
       |r AS (SELECT doc_id, n, gram, cnt, dn,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id, n ORDER BY cnt DESC, gram) AS rk FROM c)
       |SELECT doc_id, n, gram, cnt,
       |  CAST(cnt * length(gram) AS DOUBLE) / CAST(dn AS DOUBLE) AS frac
       |FROM r WHERE rk = 1 ORDER BY doc_id, n""".stripMargin
  }

  /** Per-source corpus report: doc count, token totals, and EXACT
    * token-count percentiles (p50/p90/p99, type-1 "lower" quantile:
    * the smallest value whose cumulative count reaches ceil(p·n)).
    *
    * Scale shape — the exact-percentile topology that survives 100 TB:
    * one groupBy builds the (source, token_count) HISTOGRAM (bounded
    * by the value domain, not the corpus), then a cumulative scan over
    * that small histogram selects the percentile values. Never
    * collect_list of the corpus, never a corpus-wide
    * window partitioned by a handful of sources; integer outputs keep
    * the oracle hash-exact (interpolating quantiles diverge in IEEE
    * terms across engines).
    */
  def pipelineStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val histo = Tables(s, dir, "documents")
      .select(col("source"),
        graft.plans.NativeExpressions.textStats(col("text")).getField("n_tok").as("nt"))
      .groupBy(col("source"), col("nt")).agg(count(lit(1)).as("c"))
    // asc_nulls_last: Spark's default window order is NULLS FIRST but
    // DuckDB's is NULLS LAST — a NULL-text document (null nt bucket)
    // would inflate every non-null cum in Spark only, shifting the
    // selected percentile values across engines
    val w = Window.partitionBy(col("source")).orderBy(col("nt").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    val cum = histo
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
    def pct(p: Double) = min(when(col("cum") >= ceil(lit(p) * col("n")), col("nt")))
    cum.groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        sum(col("nt") * col("c")).as("total_tokens"),
        pct(0.5).cast("long").as("p50_tokens"), pct(0.9).cast("long").as("p90_tokens"),
        pct(0.99).cast("long").as("p99_tokens"))
      .orderBy(col("source"))
  }

  val pipelineStatsSql: String =
    """WITH h AS (SELECT source, len(regexp_extract_all(lower(text),'[a-z0-9]+')) AS nt,
      |    COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |cum AS (SELECT source, nt, c,
      |    SUM(c) OVER (PARTITION BY source ORDER BY nt
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY source) AS n
      |  FROM h)
      |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
      |  CAST(SUM(nt * c) AS BIGINT) AS total_tokens,
      |  CAST(MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN nt END) AS BIGINT) AS p50_tokens,
      |  CAST(MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN nt END) AS BIGINT) AS p90_tokens,
      |  CAST(MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN nt END) AS BIGINT) AS p99_tokens
      |FROM cum GROUP BY source ORDER BY source""".stripMargin

  /** URL-level dedup via [[TextFunctions.canonicalizeUrl]]: messy URL
    * variants (scheme/host case, www, tracking params, param order,
    * fragment, trailing slash — synthesized deterministically per doc,
    * the extract_hostname pattern) collapse onto one canonical form.
    * Exact groupBy on the canonical string — the cheap first dedup
    * pass of any web corpus, upstream of content hashing. Narrow map
    * + one digest-keyed shuffle.
    */
  def dedupUrl(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val v1 = concat(lit("HTTPS://WWW."), col("source"), lit(".Example.org/Doc/"), id,
      lit("/?utm_source=feed&b=2&a=1#frag"))
    val v2 = concat(lit("https://"), col("source"), lit(".example.org/Doc/"), id,
      lit("?a=1&b=2"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(array(v1, v2)).as("url"))
      .select(TextFunctions.canonicalizeUrl(col("url")).as("canonical"))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_variants"))
      .orderBy(col("canonical"))
  }

  val dedupUrlSql: String = {
    val canon = (u: String) =>
      s"lower(regexp_extract($u, '^([A-Za-z]+)://', 1)) || '://' || " +
        s"regexp_replace(regexp_replace(lower(regexp_extract($u, '^[A-Za-z]+://([^/?#]+)', 1)), " +
        s"'^www\\.', ''), ':(80|443)$$', '') || " +
        s"regexp_replace(regexp_extract($u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/$$', '') || " +
        s"CASE WHEN q = '' THEN '' ELSE '?' || q END"
    val qexpr =
      "array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'), " +
        "x -> x <> '' AND NOT regexp_matches(x, '^(utm_[A-Za-z0-9_]+|fbclid|gclid)='))), '&')"
    s"""WITH u AS (SELECT doc_id, unnest([
       |    'HTTPS://WWW.' || source || '.Example.org/Doc/' || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag',
       |    'https://' || source || '.example.org/Doc/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2']) AS url
       |  FROM documents),
       |cq AS (SELECT url, $qexpr AS q FROM u)
       |SELECT ${canon("url")} AS canonical, COUNT(*) AS n_variants
       |FROM cq GROUP BY 1 ORDER BY canonical""".stripMargin
  }

  /** The full Gopher quality-filter rule panel (Rae et al. 2021,
    * Table A1): per document — word count bounds, mean word length
    * bounds, symbol-to-word ratio ('#' and '...'), bullet-line and
    * ellipsis-line fractions, alphabetic-word fraction, and the
    * 8-stopword presence rule — plus the combined keep decision.
    * The corpus text is single-line, so deterministic line structure
    * (bullets / trailing ellipses / hashtags) is synthesized per
    * doc_id (the text_redact convention) to exercise the line rules;
    * the oracle re-derives the same.
    *
    * Words split on the EXPLICIT [\t\n\f\r ] class (never \s — Java
    * and RE2 disagree on U+000B, the text_bpe lesson). Every ratio is
    * one double division of exact integer counts, so values — and the
    * boundary comparisons of the keep flag — are bit-identical across
    * engines. Scale shape: one narrow codegen'd map over documents,
    * no shuffle but the final sort.
    */
  def filterGopher(s: SparkSession, dir: String): DataFrame = {
    val text = concat(col("text"),
      when(col("doc_id") % 7 === 0, lit("\n- bullet item\n- second item")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit("\nto be continued...\nmore #tags #here..."))
        .otherwise(lit("")))
    Tables(s, dir, "documents")
      .select(col("doc_id"), gopherPanel(text).as("g"))
      .select(col("doc_id"), col("g.*"))
      .orderBy(col("doc_id"))
  }

  /** The Gopher rule panel as a reusable column expression — stateless,
    * so it composes into streams and the funnel report unchanged.
    */
  def gopherPanel(text: Column): Column = {
    import TextFunctions.bindOnce
    bindOnce(text) { t =>
      bindOnce(filter(split(t, s"[${TextFunctions.BpeWsClass}]+"), w => w =!= "")) { words =>
        bindOnce(filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")) { lines =>
          bindOnce(TextFunctions.tokens(t)) { toks =>
            gopherCore(t, words, lines, toks)
          }
        }
      }
    }
  }

  /** Gopher rules over PRE-BOUND (t, words, lines, toks) — the funnel
    * shares one binding of those across all three gates.
    */
  private def gopherCore(t: Column, words: Column, lines: Column,
                         toks: Column): Column = {
    // Gopher's rule is ">= 2 of a required-stopword list"; the list here
    // is the corpus-adapted [[TextFunctions.Stopwords]] (the paper's
    // 8-word English list barely intersects this synthetic corpus — it
    // would mark every doc False and test nothing)
    val stop = TextFunctions.Stopwords
    val nWords = size(words)
    val sumLen = aggregate(words, lit(0L), (a, w) => a + length(w))
    val meanLen = when(nWords > 0, sumLen.cast("double") / nWords.cast("double"))
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEll = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / lit(3))
      .cast("int")
    val nLines = size(lines)
    val nBullet = size(filter(lines, l => l.startsWith("-") || l.startsWith("*")))
    val nEllEnd = size(filter(lines, l => l.endsWith("...")))
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]")))
    val nStop = size(filter(array(stop.map(lit): _*), sw => array_contains(toks, sw)))
    val symbolRatio = when(nWords > 0, (nHash + nEll).cast("double") / nWords.cast("double"))
    val bulletFrac = when(nLines > 0, nBullet.cast("double") / nLines.cast("double"))
    val ellFrac = when(nLines > 0, nEllEnd.cast("double") / nLines.cast("double"))
    val alphaFrac = when(nWords > 0, nAlpha.cast("double") / nWords.cast("double"))
    val keep = coalesce(
      nWords.between(50, 100000) && meanLen.between(3.0, 10.0) &&
        symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellFrac <= 0.3 &&
        alphaFrac >= 0.8 && nStop >= 2,
      lit(false))
    struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      nStop.as("n_stop"), keep.as("keep"))
  }

  val filterGopherSql: String = {
    val text = "text || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '- bullet item' || chr(10) || " +
      "'- second item' ELSE '' END || CASE WHEN doc_id % 11 = 0 THEN chr(10) || " +
      "'to be continued...' || chr(10) || 'more #tags #here...' ELSE '' END"
    """WITH d AS (SELECT doc_id, <T> AS t FROM documents),
      |p AS (SELECT doc_id,
      |    list_filter(string_split_regex(t, '[\t\n\f\r ]+'), x -> x <> '') AS words,
      |    list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)), l -> l <> '') AS lines,
      |    length(t) - length(replace(t, '#', '')) AS n_hash,
      |    (length(t) - length(replace(t, '...', ''))) // 3 AS n_ell,
      |    regexp_extract_all(lower(t), '[a-z0-9]+') AS toks
      |  FROM d),
      |m AS (SELECT doc_id,
      |    len(words) AS n_words,
      |    CASE WHEN len(words) > 0 THEN
      |      CAST(list_reduce(list_transform(words, w -> length(w)), (a, b) -> a + b) AS DOUBLE)
      |        / CAST(len(words) AS DOUBLE) END AS mean_word_len,
      |    CASE WHEN len(words) > 0 THEN
      |      CAST(n_hash + n_ell AS DOUBLE) / CAST(len(words) AS DOUBLE) END AS symbol_ratio,
      |    CASE WHEN len(lines) > 0 THEN
      |      CAST(len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
      |        / CAST(len(lines) AS DOUBLE) END AS bullet_frac,
      |    CASE WHEN len(lines) > 0 THEN
      |      CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE)
      |        / CAST(len(lines) AS DOUBLE) END AS ellipsis_frac,
      |    CASE WHEN len(words) > 0 THEN
      |      CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
      |        / CAST(len(words) AS DOUBLE) END AS alpha_frac,
      |    len(list_filter(['the','a','of','and','in','to','is'],
      |      sw -> list_contains(toks, sw))) AS n_stop
      |  FROM p)
      |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac,
      |  alpha_frac, n_stop,
      |  COALESCE(n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
      |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
      |    AND alpha_frac >= 0.8 AND n_stop >= 2, FALSE) AS keep
      |FROM m ORDER BY doc_id""".stripMargin.replace("<T>", text)
  }

  /** The C4 heuristic cleaning panel (Raffel et al. 2020 §2.2 — the
    * other canonical web-corpus rule set beside Gopher): line-level —
    * retain only lines that end in a terminal punctuation mark, have
    * ≥ 5 words, and don't mention "javascript"; page-level — drop
    * pages with < 3 sentences, any "lorem ipsum", any curly brace, or
    * any blocklisted word. The corpus text is single-line, so line
    * structure is synthesized per doc_id (the filter_gopher
    * convention; different mod classes so the two panels don't test
    * the same rows), and the badword rule matches whole TOKENS through
    * the document tokenizer — never substrings.
    *
    * Counts are exact ints and flags exact bools, so the keep decision
    * is bit-identical across engines. Scale shape: one narrow
    * codegen'd map over documents, no shuffle but the final sort —
    * the same shape C4 itself ran over 20 TB of Common Crawl.
    */
  /** The deterministic line/sentence enrichment the C4 panel (and the
    * funnel report) run on — the corpus text is single-line and
    * punctuation-free, so rule structure is synthesized per doc_id.
    */
  private[queries] def c4DemoText: Column = concat(col("text"),
      when(col("doc_id") % 4 === 0, lit("\nShort line")).otherwise(lit("")),
      // three full sentences: the corpus text itself has NO punctuation,
      // so this is what makes the ≥3-sentence page gate reachable
      when(col("doc_id") % 5 === 0,
        lit("\nThis appended sentence clearly contains more than five words." +
          "\nAnother appended sentence also contains well over five words." +
          "\nA third full sentence closes out this appended paragraph nicely."))
        .otherwise(lit("")),
      when(col("doc_id") % 9 === 0, lit("\nEnable javascript to view this page."))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit("\nlorem ipsum dolor sit amet."))
        .otherwise(lit("")),
      when(col("doc_id") % 17 === 0, lit("\nfunction f() { return 1; }"))
        .otherwise(lit("")),
      when(col("doc_id") % 19 === 0, lit("\nThis line mentions badword1 today."))
        .otherwise(lit("")))

  def filterC4(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), c4Panel(c4DemoText).as("c"))
      .select(col("doc_id"), col("c.*"))
      .orderBy(col("doc_id"))

  /** The C4 rule panel as a reusable column expression — stateless, so
    * it drops into a streaming plan unchanged (StreamCurationSpec).
    */
  def c4Panel(text: Column): Column = {
    import TextFunctions.bindOnce
    bindOnce(text) { t =>
      bindOnce(filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")) { lines =>
        bindOnce(TextFunctions.tokens(t)) { toks =>
          c4Core(t, lines, toks)
        }
      }
    }
  }

  /** C4 rules over PRE-BOUND (t, lines, toks) — see [[gopherCore]]. */
  private def c4Core(t: Column, lines: Column, toks: Column): Column = {
    import TextFunctions.bindOnce
    val lineWords = (l: Column) =>
      size(filter(split(l, s"[${TextFunctions.BpeWsClass}]+"), w => w =!= ""))
    val lineKept = (l: Column) =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
        lineWords(l) >= 5 && !lower(l).contains("javascript")
    // bind the kept-line count: output and keep both reference it, and
    // an unbound reference re-runs the nested per-line word-split filter
    bindOnce(size(filter(lines, lineKept)).cast("int")) { nKept =>
      val nLines = size(lines)
      val nSent = length(t) - length(translate(t, ".!?", ""))
      val hasLorem = lower(t).contains("lorem ipsum")
      val hasBrace = t.contains("{")
      val hasBad = array_contains(toks, "badword1") || array_contains(toks, "badword2")
      val keep = nSent >= 3 && !hasLorem && !hasBrace && !hasBad && nKept >= 1
      struct(nLines.as("n_lines"), nKept.as("n_kept"), nSent.as("n_sentences"),
        hasLorem.as("has_lorem"), hasBrace.as("has_brace"), hasBad.as("has_badword"),
        keep.as("keep"))
    }
  }

  /** [[c4DemoText]] restated in DuckDB SQL — shared by the C4 and
    * funnel oracles.
    */
  private val C4DemoTextSql: String = "text" +
    " || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'Short line' ELSE '' END" +
    " || CASE WHEN doc_id % 5 = 0 THEN chr(10) || " +
    "'This appended sentence clearly contains more than five words.' || chr(10) || " +
    "'Another appended sentence also contains well over five words.' || chr(10) || " +
    "'A third full sentence closes out this appended paragraph nicely.' ELSE '' END" +
    " || CASE WHEN doc_id % 9 = 0 THEN chr(10) || " +
    "'Enable javascript to view this page.' ELSE '' END" +
    " || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END" +
    " || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'function f() { return 1; }' ELSE '' END" +
    " || CASE WHEN doc_id % 19 = 0 THEN chr(10) || " +
    "'This line mentions badword1 today.' ELSE '' END"

  val filterC4Sql: String = {
    val text = C4DemoTextSql
    """WITH d AS (SELECT doc_id, <T> AS t FROM documents),
      |p AS (SELECT doc_id, t,
      |    list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)), l -> l <> '') AS lines,
      |    regexp_extract_all(lower(t), '[a-z0-9]+') AS toks
      |  FROM d),
      |m AS (SELECT doc_id,
      |    len(lines) AS n_lines,
      |    len(list_filter(lines, l ->
      |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?') OR ends_with(l, '"'))
      |      AND len(list_filter(string_split_regex(l, '[\t\n\f\r ]+'), w -> w <> '')) >= 5
      |      AND NOT contains(lower(l), 'javascript'))) AS n_kept,
      |    length(t) - length(translate(t, '.!?', '')) AS n_sentences,
      |    contains(lower(t), 'lorem ipsum') AS has_lorem,
      |    contains(t, '{') AS has_brace,
      |    list_contains(toks, 'badword1') OR list_contains(toks, 'badword2') AS has_badword
      |  FROM p)
      |SELECT doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace, has_badword,
      |  n_sentences >= 3 AND NOT has_lorem AND NOT has_brace AND NOT has_badword
      |    AND n_kept >= 1 AS keep
      |FROM m ORDER BY doc_id""".stripMargin.replace("<T>", text)
  }

  /** Flesch readability panel (Flesch 1948; Kincaid et al. 1975 for the
    * grade formula) — the classic text-difficulty signal used as a
    * quality feature in corpus curation: reading ease
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) and the
    * FK grade 0.39·(w/s) + 11.8·(syl/w) − 15.59. Syllables use the
    * standard vowel-group heuristic (runs of [aeiouy], min 1 per word);
    * sentence count falls back to 1 when the text has no terminal
    * punctuation (this corpus has none — readability tools treat
    * unpunctuated text as one sentence).
    *
    * All inputs are exact integer counts and the score expressions are
    * the same fixed arithmetic tree in both engines, so the doubles —
    * and the CASE band cut on them — are bit-identical. Scale shape:
    * one narrow map, no shuffle but the final sort.
    *
    * Syllable counting avoids a regex-extract PER WORD (measured 2.5s
    * at sf0.1): vowel runs can't span whitespace, so the corpus-wide
    * run count is two whole-text regexp_replace length diffs —
    * replacing each run with one char keeps exactly one char per run,
    * removing runs keeps zero, and non-vowel chars cancel — plus one
    * cheap first-match rlike per word for the min-1-per-word floor.
    */
  def textReadability(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), readabilityPanel(col("text")).as("r"))
      .select(col("doc_id"), col("r.*"))
      .orderBy(col("doc_id"))

  /** The Flesch panel as a reusable column expression — stateless, so
    * it drops into a streaming plan unchanged (StreamCurationSpec).
    * Round 4: the four counters come from the one-pass native
    * [[graft.plans.NativeExpressions.ReadabilityStats]] (integer-exact
    * vs the composed regex formulation, parity-spec'd — the oracle is
    * unchanged); [[readabilityPanelHof]] keeps the original
    * two-regexp_replace + per-word-rlike formulation as the
    * independent reference.
    */
  def readabilityPanel(text: Column): Column = {
    import TextFunctions.bindOnce
    bindOnce(graft.plans.NativeExpressions.readabilityStats(text)) { st =>
      val nWords = st.getField("n_words")
      val nSent = greatest(st.getField("n_sent_raw"), lit(1))
      bindOnce((st.getField("n_runs") + st.getField("n_novowel")).cast("long")) { nSyl =>
        val wps = nWords.cast("double") / nSent.cast("double")
        val spw = nSyl.cast("double") / nWords.cast("double")
        bindOnce(when(nWords > 0,
          lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)) { ease =>
          val grade = when(nWords > 0, lit(0.39) * wps + lit(11.8) * spw - lit(15.59))
          val band = when(ease.isNull, lit(null).cast("string"))
            .when(ease >= 90.0, lit("very_easy"))
            .when(ease >= 60.0, lit("standard"))
            .when(ease >= 30.0, lit("difficult"))
            .otherwise(lit("very_confusing"))
          struct(nWords.as("n_words"), nSent.as("n_sentences"), nSyl.as("n_syllables"),
            ease.as("flesch_ease"), grade.as("fk_grade"), band.as("band"))
        }
      }
    }
  }

  /** The original composed formulation, kept as the parity reference
    * for the native counters.
    */
  def readabilityPanelHof(text: Column): Column = {
    import TextFunctions.bindOnce
    bindOnce(text) { t =>
      bindOnce(filter(split(t, s"[${TextFunctions.BpeWsClass}]+"), w => w =!= "")) { words =>
        bindOnce(lower(t)) { lt =>
          // bind the syllable count and the ease score: each is
          // referenced several times below (spw feeds ease AND grade;
          // ease feeds output AND four band comparisons) and an unbound
          // reference re-evaluates its whole subtree — including the
          // two regexp_replace passes — at every use
          val nRuns = length(regexp_replace(lt, "[aeiouy]+", "#")) -
            length(regexp_replace(lt, "[aeiouy]+", ""))
          val nNoVowel = size(filter(words, w => !lower(w).rlike("[aeiouy]")))
          bindOnce((nRuns + nNoVowel).cast("long")) { nSyl =>
            val nWords = size(words)
            val nSent = greatest(length(t) - length(translate(t, ".!?", "")), lit(1))
            val wps = nWords.cast("double") / nSent.cast("double")
            val spw = nSyl.cast("double") / nWords.cast("double")
            bindOnce(when(nWords > 0,
              lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)) { ease =>
              val grade = when(nWords > 0, lit(0.39) * wps + lit(11.8) * spw - lit(15.59))
              val band = when(ease.isNull, lit(null).cast("string"))
                .when(ease >= 90.0, lit("very_easy"))
                .when(ease >= 60.0, lit("standard"))
                .when(ease >= 30.0, lit("difficult"))
                .otherwise(lit("very_confusing"))
              struct(nWords.as("n_words"), nSent.as("n_sentences"), nSyl.as("n_syllables"),
                ease.as("flesch_ease"), grade.as("fk_grade"), band.as("band"))
            }
          }
        }
      }
    }
  }

  val textReadabilitySql: String =
    """WITH p AS (SELECT doc_id,
      |    list_filter(string_split_regex(text, '[\t\n\f\r ]+'), w -> w <> '') AS words,
      |    greatest(length(text) - length(translate(text, '.!?', '')), 1) AS n_sentences,
      |    length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
      |      - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS n_runs
      |  FROM documents),
      |m AS (SELECT doc_id,
      |    len(words) AS n_words, n_sentences,
      |    n_runs + len(list_filter(words, w ->
      |      NOT regexp_matches(lower(w), '[aeiouy]'))) AS n_syllables
      |  FROM p),
      |sc AS (SELECT doc_id, n_words, n_sentences, n_syllables,
      |    CASE WHEN n_words > 0 THEN
      |      206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
      |        - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) END AS flesch_ease,
      |    CASE WHEN n_words > 0 THEN
      |      0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
      |        + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59 END AS fk_grade
      |  FROM m)
      |SELECT doc_id, n_words, n_sentences, n_syllables, flesch_ease, fk_grade,
      |  CASE WHEN flesch_ease IS NULL THEN NULL
      |    WHEN flesch_ease >= 90.0 THEN 'very_easy'
      |    WHEN flesch_ease >= 60.0 THEN 'standard'
      |    WHEN flesch_ease >= 30.0 THEN 'difficult'
      |    ELSE 'very_confusing' END AS band
      |FROM sc ORDER BY doc_id""".stripMargin

  /** The curation funnel report — the per-source summary every corpus
    * run produces before training: how many documents survive exact
    * text dedup and each quality gate (Gopher panel, C4 rules,
    * classifier), the intersection of all three, and the unique-text
    * count among full survivors. One scan computes the per-doc digest
    * + three keep flags (the same certified panel expressions, over
    * the shared [[c4DemoText]] enrichment so every gate discriminates
    * on this corpus); one groupBy(source) aggregates. The two distinct
    * counts are exact (Spark expands them to the standard two-phase
    * plan) — at 100 TB swap in approx_count_distinct if ±2% is
    * acceptable, the rest of the plan is unchanged.
    */
  def pipelineFunnel(s: SparkSession, dir: String): DataFrame = {
    import TextFunctions.bindOnce
    // one shared binding of (t, words, lines, toks) feeds ALL three
    // gates — the panels tokenize/split independently when used alone,
    // which would triple the per-row regex work in this single scan
    val flags = bindOnce(c4DemoText) { t =>
      bindOnce(filter(split(t, s"[${TextFunctions.BpeWsClass}]+"), w => w =!= "")) { words =>
        bindOnce(filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")) { lines =>
          bindOnce(TextFunctions.tokens(t)) { toks =>
            struct(
              gopherCore(t, words, lines, toks).getField("keep").as("kg"),
              c4Core(t, lines, toks).getField("keep").as("kc"),
              classifierCore(toks).getField("keep").as("kf"))
          }
        }
      }
    }
    Tables(s, dir, "documents")
      .select(col("source"), sha2(col("text"), 256).as("h"), flags.as("f"))
      .select(col("source"), col("h"),
        col("f.kg").as("kg"), col("f.kc").as("kc"), col("f.kf").as("kf"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_unique_text"),
        sum(when(col("kg"), 1L).otherwise(0L)).as("n_keep_gopher"),
        sum(when(col("kc"), 1L).otherwise(0L)).as("n_keep_c4"),
        sum(when(col("kf"), 1L).otherwise(0L)).as("n_keep_classifier"),
        sum(when(col("kg") && col("kc") && col("kf"), 1L).otherwise(0L)).as("n_keep_all"),
        countDistinct(when(col("kg") && col("kc") && col("kf"), col("h")))
          .as("n_final_unique"))
      .orderBy(col("source"))
  }

  val pipelineFunnelSql: String = {
    val bucket = "CAST(concat('0x', substr(md5(tk), 1, 8)) AS BIGINT) % 64"
    val w = s"(strpos('0123456789abcdef', substr(md5('w:' || CAST($bucket AS VARCHAR)), 1, 1)) - 1)" +
      " / 7.5 - 1.0"
    s"""WITH d AS (SELECT doc_id, source, sha256(text) AS h, $C4DemoTextSql AS t FROM documents),
       |p AS (SELECT doc_id, source, h, t,
       |    list_filter(string_split_regex(t, '[\\t\\n\\f\\r ]+'), x -> x <> '') AS words,
       |    list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)), l -> l <> '') AS lines,
       |    length(t) - length(replace(t, '#', '')) AS n_hash,
       |    (length(t) - length(replace(t, '...', ''))) // 3 AS n_ell,
       |    regexp_extract_all(lower(t), '[a-z0-9]+') AS toks
       |  FROM d),
       |flags AS (SELECT doc_id, source, h,
       |    COALESCE(len(words) BETWEEN 50 AND 100000
       |      AND CASE WHEN len(words) > 0 THEN
       |        CAST(list_reduce(list_transform(words, w -> length(w)), (a, b) -> a + b) AS DOUBLE)
       |          / CAST(len(words) AS DOUBLE) END BETWEEN 3.0 AND 10.0
       |      AND CASE WHEN len(words) > 0 THEN
       |        CAST(n_hash + n_ell AS DOUBLE) / CAST(len(words) AS DOUBLE) END <= 0.1
       |      AND CASE WHEN len(lines) > 0 THEN
       |        CAST(len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
       |          / CAST(len(lines) AS DOUBLE) END <= 0.9
       |      AND CASE WHEN len(lines) > 0 THEN
       |        CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE)
       |          / CAST(len(lines) AS DOUBLE) END <= 0.3
       |      AND CASE WHEN len(words) > 0 THEN
       |        CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
       |          / CAST(len(words) AS DOUBLE) END >= 0.8
       |      AND len(list_filter(['the','a','of','and','in','to','is'],
       |        sw -> list_contains(toks, sw))) >= 2, FALSE) AS kg,
       |    length(t) - length(translate(t, '.!?', '')) >= 3
       |      AND NOT contains(lower(t), 'lorem ipsum')
       |      AND NOT contains(t, '{')
       |      AND NOT (list_contains(toks, 'badword1') OR list_contains(toks, 'badword2'))
       |      AND len(list_filter(lines, l ->
       |        (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?') OR ends_with(l, '"'))
       |        AND len(list_filter(string_split_regex(l, '[\\t\\n\\f\\r ]+'), x -> x <> '')) >= 5
       |        AND NOT contains(lower(l), 'javascript'))) >= 1 AS kc,
       |    COALESCE(CASE WHEN len(toks) > 0 THEN
       |      list_reduce(list_transform(toks, tk -> $w), (x, y) -> x + y)
       |        / CAST(len(toks) AS DOUBLE) END >= 0, FALSE) AS kf
       |  FROM p)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_text,
       |  CAST(SUM(CASE WHEN kg THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_gopher,
       |  CAST(SUM(CASE WHEN kc THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_c4,
       |  CAST(SUM(CASE WHEN kf THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_classifier,
       |  CAST(SUM(CASE WHEN kg AND kc AND kf THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_all,
       |  CAST(COUNT(DISTINCT CASE WHEN kg AND kc AND kf THEN h END) AS BIGINT) AS n_final_unique
       |FROM flags GROUP BY source ORDER BY source""".stripMargin
  }

  /** md5 hex digest (driver-side) — matches DuckDB's md5() exactly. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic stand-in weights for the classifier gate: one double
    * in [-1, 1] per hash bucket, derived from md5 like the LSH
    * hyperplanes (first hex digit / 7.5 − 1) so the DuckDB oracle can
    * restate them in closed form. Swapping in TRAINED weights changes
    * the scores, not the plan.
    */
  private[queries] val ClassifierWeights: Array[Double] =
    (0 until 64).map(j =>
      "0123456789abcdef".indexOf(md5hex("w:" + j).charAt(0)) / 7.5 - 1.0).toArray

  /** fastText-style quality-classifier gate (Joulin et al. 2016; the
    * classifier-filtering stage of the GPT-3 / LLaMA / CCNet data
    * pipelines): a linear bag-of-words model over HASHED token features
    * — bucket = md5(token) mod 64 (the hashing trick), score = mean
    * bucket weight over the document's tokens, keep = score ≥ 0.
    * Weights here are deterministic md5-derived stand-ins (see
    * [[ClassifierWeights]]); a production model drops in its trained
    * vector without touching the plan. The sigmoid is monotone, so
    * thresholding the raw linear score is the same decision and stays
    * engine-exact (exp() is NOT bit-portable across libm
    * implementations — the text_perplexity lesson applied).
    *
    * Scale shape: one narrow codegen'd map over documents — the
    * 64-weight table is a plan-time literal array, the score a single
    * sequential fold in token order (bit-identical to the oracle's
    * list_reduce), no shuffle but the final sort. This is the shape
    * that classifier-filtered 45 TB of Common Crawl for GPT-3.
    */
  def filterClassifier(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), classifierPanel(col("text")).as("c"))
      .select(col("doc_id"), col("c.*"))
      .orderBy(col("doc_id"))

  /** The classifier gate as a reusable column expression — stateless,
    * so it drops into a streaming plan unchanged (StreamCurationSpec).
    */
  def classifierPanel(text: Column): Column =
    TextFunctions.bindOnce(TextFunctions.tokens(text))(classifierCore)

  /** Classifier gate over PRE-BOUND tokens — see [[gopherCore]]. */
  private def classifierCore(toks: Column): Column = {
    import TextFunctions.bindOnce
    val weights = array(ClassifierWeights.map(lit): _*)
    val z = aggregate(toks, lit(0.0), (acc, t) =>
      acc + element_at(weights,
        (conv(substr(md5(t), lit(1), lit(8)), 16, 10).cast("long") % 64).cast("int") + 1))
    val n = size(toks)
    // bind the score: output and keep both reference it, and an
    // unbound reference re-runs the whole md5-per-token fold
    bindOnce(when(n > 0, z / n.cast("double"))) { score =>
      struct(n.as("n_tokens"), score.as("score"),
        coalesce(score >= 0, lit(false)).as("keep"))
    }
  }

  val filterClassifierSql: String = {
    val bucket = "CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % 64"
    val w = s"(strpos('0123456789abcdef', substr(md5('w:' || CAST($bucket AS VARCHAR)), 1, 1)) - 1)" +
      " / 7.5 - 1.0"
    s"""WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents),
       |m AS (SELECT doc_id, len(toks) AS n_tokens,
       |    CASE WHEN len(toks) > 0 THEN
       |      list_reduce(list_transform(toks, t -> $w), (x, y) -> x + y)
       |        / CAST(len(toks) AS DOUBLE) END AS score
       |  FROM tk)
       |SELECT doc_id, n_tokens, score, COALESCE(score >= 0, FALSE) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** UT1-style URL blocklist filtering (the first gate of a web-corpus
    * pipeline, e.g. RefinedWeb §3.1): a blocklist entry blocks a host
    * AND every subdomain of it. URLs are synthesized deterministically
    * per doc (the dedup_url convention) with a rotating subdomain so
    * both match modes are exercised: one entry blocks a whole
    * registered domain, the other one exact subdomain host.
    *
    * Scale shape — the real UT1 list is ~4M domains, so never a LIKE
    * scan: each host expands to its (bounded, ≤ label-count) domain
    * suffixes, which EQUI-join against the broadcast blocklist; one
    * per-doc aggregation folds hits back. explode_outer keeps
    * unparseable hosts in the kept counts.
    */
  def filterUrl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blocklist = Seq("src3.example.org", "m1.src7.example.org")
    val url = concat(lit("https://m"), (col("doc_id") % 3).cast("string"), lit("."),
      col("source"), lit(".example.org/p/"), col("doc_id").cast("string"))
    val host = regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)
    // guard: a <2-label host would send sequence() a negative stop
    // (descending range -> slice(start=0) error); emit no suffixes
    val suffixes = TextFunctions.bindOnce(split(host, "\\.")) { labels =>
      when(size(labels) >= 2,
        transform(sequence(lit(0), size(labels) - 2), i =>
          array_join(slice(labels, i + 1, size(labels)), ".")))
        .otherwise(array().cast("array<string>"))
    }
    val bl = broadcast(blocklist.toDF("domain"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), explode_outer(suffixes).as("domain"))
      .join(bl.withColumn("hit", lit(1)), Seq("domain"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg((count(col("hit")) > 0).as("blocked"))
      .groupBy(col("source"))
      .agg(sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"),
        sum(when(!col("blocked"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  val filterUrlSql: String =
    """WITH u AS (SELECT doc_id, source,
      |    'https://m' || CAST(doc_id % 3 AS VARCHAR) || '.' || source ||
      |      '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url
      |  FROM documents),
      |h AS (SELECT doc_id, source,
      |    string_split(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1), '.') AS labels
      |  FROM u),
      |sfx AS (SELECT doc_id, source, array_to_string(labels[i+1:], '.') AS domain
      |  FROM h, UNNEST(range(len(labels) - 1)) AS t(i)),
      |bl AS (SELECT unnest(['src3.example.org', 'm1.src7.example.org']) AS domain),
      |flg AS (SELECT s.doc_id, s.source, COUNT(b.domain) > 0 AS blocked
      |  FROM sfx s LEFT JOIN bl b ON s.domain = b.domain
      |  GROUP BY 1, 2)
      |SELECT source,
      |  CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
      |  CAST(SUM(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
      |FROM flg GROUP BY source ORDER BY source""".stripMargin

  /** Feature hashing (the "hashing trick", Weinberger et al. 2009):
    * the sparse 64-bucket bag-of-words matrix the fastText-shaped
    * classifier gate consumes — materialized as (doc, bucket, tf)
    * rows. Bucket = md5-derived token hash mod 64, the EXACT hash the
    * classifier's weight lookup uses, so this is its feature matrix,
    * not a lookalike. Integer term frequencies; narrow
    * explode→aggregate, one keyed shuffle at any scale. Restricted to
    * doc_id < 100 to keep the certified output bounded.
    */
  def textHashFeatures(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .withColumn("bucket",
        conv(substr(md5(col("tok")), lit(1), lit(8)), 16, 10).cast("long") % 64)
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("tf"))
      .orderBy(col("doc_id"), col("bucket"))

  val textHashFeaturesSql: String =
    """WITH tk AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      |  FROM documents WHERE doc_id < 100)
      |SELECT doc_id,
      |  CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS bucket,
      |  COUNT(*) AS tf
      |FROM tk GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_hash_features" -> (textHashFeatures _),
    "pipeline_split" -> (pipelineSplit _),
    "dedup_url" -> (dedupUrl _),
    "filter_gopher" -> (filterGopher _),
    "filter_c4" -> (filterC4 _),
    "filter_classifier" -> (filterClassifier _),
    "filter_url" -> (filterUrl _),
    "text_readability" -> (textReadability _),
    "pipeline_funnel" -> (pipelineFunnel _),
    "pipeline_stats" -> (pipelineStats _),
    "text_gopher" -> (textGopher _),
    "text_repetition" -> (textRepetition _),
    "text_redact" -> (textRedact _),
    "text_perplexity" -> (textPerplexity _),
    "contamination" -> ((s: SparkSession, dir: String) => contamination(s, dir)))

  val oracles: Map[String, String] = Map(
    "text_hash_features" -> textHashFeaturesSql,
    "pipeline_split" -> pipelineSplitSql,
    "dedup_url" -> dedupUrlSql,
    "filter_gopher" -> filterGopherSql,
    "filter_c4" -> filterC4Sql,
    "filter_classifier" -> filterClassifierSql,
    "filter_url" -> filterUrlSql,
    "text_readability" -> textReadabilitySql,
    "pipeline_funnel" -> pipelineFunnelSql,
    "pipeline_stats" -> pipelineStatsSql,
    "text_gopher" -> textGopherSql,
    "text_repetition" -> textRepetitionSql,
    "text_redact" -> textRedactSql,
    "text_perplexity" -> textPerplexitySql,
    "contamination" -> contaminationSql)
}
