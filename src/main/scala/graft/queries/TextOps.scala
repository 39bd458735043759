package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import Exact._

/** Text-analysis + extraction-plane queries (SURVEY §2.3, builder brief's
  * text-analysis ops) over the `documents` and `events` tables.
  * All narrow maps + one final aggregation — at 100 TB these are
  * scan-bound with zero shuffles before the (tiny) grouped output.
  */
object TextOps {

  private val TokSql = "regexp_extract_all(lower(text),'[a-z0-9]+')"
  private def stopListSql = Stopwords.map(s => s"'$s'").mkString(", ")

  /** Token statistics per language (token counting op). Uses the
    * one-pass native TextStats expression (integer-identical to the
    * composed regex formulation — parity spec'd).
    */
  def textTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"lang", graft.plans.NativeExpressions.textStats($"text").as("st"))
      .groupBy($"lang")
      .agg(
        sum($"st.n_tok".cast("long")).as("tokens"),
        sum($"st.n_alnum".cast("long")).as("alnum_chars"),
        count(lit(1)).as("docs"))
      .orderBy($"lang")
  }

  // DuckDB SUM(BIGINT) widens to HUGEINT (decimal128 through Arrow) while
  // Spark's sum(long) stays int64 — cast back to BIGINT so the driver's
  // value hash sees the same representation on both sides.
  val textTokensSql: String =
    s"""SELECT lang, CAST(SUM(len($TokSql)) AS BIGINT) AS tokens,
       |  CAST(SUM(length(regexp_replace(lower(text),'[^a-z0-9]','','g'))) AS BIGINT) AS alnum_chars,
       |  COUNT(*) AS docs
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** BPE-pretokenizer piece statistics (builder brief: token counting
    * via "a BPE-ish regex" beside the whitespace counter above): per
    * language, total pieces, pieces net of pure-whitespace runs (the
    * count a byte-level BPE would expand to tokens), and the largest
    * single-document piece count — the sequence-budget planning stats.
    * Narrow map + one aggregation; case-preserving like the real
    * GPT-2 pretokenizer.
    */
  def textBpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pieces = graft.functions.TextFunctions.bpePieces($"text")
    // explicit whitespace class, same reason as BpePieceRx (Java \s
    // includes U+000B, RE2's does not)
    val wsOnly = s"^[${graft.functions.TextFunctions.BpeWsClass}]+$$"
    val nonWs = graft.functions.TextFunctions.bindOnce(pieces) { p =>
      struct(size(p).as("all"),
        size(filter(p, x => !x.rlike(wsOnly))).as("content"))
    }
    Tables(s, dir, "documents")
      .select($"lang", nonWs.as("pc"))
      .groupBy($"lang")
      .agg(sum($"pc.all".cast("long")).as("pieces"),
        sum($"pc.content".cast("long")).as("content_pieces"),
        max($"pc.content".cast("long")).as("max_doc_pieces"),
        count(lit(1)).as("docs"))
      .orderBy($"lang")
  }

  /** TRAINED BPE subword tokenizer (round 4 — [[graft.functions.Bpe]]):
    * 8 merges learned from the 64 lowest-id docs driver-side, applied
    * as a literal replace() fold; per-doc word and subword counts.
    * The oracle RERUNS THE TRAINING — 8 unrolled pair-count/argmax/
    * rewrite rounds in SQL — then applies the same nested replaces, so
    * the learned merges AND every count hash-match bit-exact (the
    * sim_*_t pattern applied to tokenization).
    */
  def textBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r12: both the training sample's md5 order and the per-doc merge
    // application ran single-task off the one-split scan — spread once
    val docs = graft.Tables.spreadToWidth(Tables(s, dir, "documents"))
    val merges = graft.functions.Bpe.trainMerges(docs, "doc_id", "text",
      sampleN = 64, nMerges = 8)
    docs.select($"doc_id",
        size(graft.functions.TextFunctions.tokens($"text")).as("n_words"),
        graft.functions.Bpe.bpeTokenCount($"text", merges).as("n_bpe"))
      .filter($"n_words" > 0)
      .orderBy($"doc_id")
  }

  private val BpeMergeRounds = 8

  /** Shared oracle CTE block: the full BPE training replay (sample →
    * word-freq vocab → [[BpeMergeRounds]] pair-count/argmax/rewrite
    * rounds). MATERIALIZED: each round's vocab/merge must evaluate
    * ONCE — the chain is referenced by the next round AND by the final
    * nested apply, and default CTE inlining re-runs the whole prefix
    * per reference (exponential in rounds).
    */
  private[queries] val BpeTrainCtes: String = {
    val rounds = (0 until BpeMergeRounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT p, SUM(f) AS c FROM (
         |  SELECT f, unnest(list_transform(range(len(s)-1), i -> s[i+1] || ' ' || s[i+2])) AS p
         |  FROM (SELECT string_split(trim(w), '  ') AS s, f FROM v$r)) GROUP BY p),
         |m$r AS MATERIALIZED (SELECT p,
         |    ' ' || string_split(p, ' ')[1] || '  ' || string_split(p, ' ')[2] || ' ' AS pf,
         |    ' ' || replace(p, ' ', '') || ' ' AS pt
         |  FROM p$r ORDER BY c DESC, p LIMIT 1),
         |v${r + 1} AS MATERIALIZED (SELECT replace(w, (SELECT pf FROM m$r), (SELECT pt FROM m$r)) AS w, f FROM v$r)""".stripMargin
    }.mkString(",\n")
    s"""smp AS (SELECT text FROM documents
       |  ORDER BY md5('bpe:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 64),
       |wf AS (SELECT tok AS word, COUNT(*) AS f FROM (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM smp) GROUP BY tok),
       |v0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS w, f FROM wf),
       |$rounds""".stripMargin
  }

  /** The nested-replace application of the trained merges to `e`. */
  private[queries] def bpeAppliedOn(e: String): String =
    (0 until BpeMergeRounds).foldLeft(
      s"regexp_replace($e, '(.)', ' \\1 ', 'g')") { (acc, r) =>
      s"replace($acc, (SELECT pf FROM m$r), (SELECT pt FROM m$r))"
    }

  /** The nested-replace application of the trained merges to `word`. */
  private[queries] val BpeApplied: String = bpeAppliedOn("word")

  /** Per-doc BPE token counts over `documents` (docs with ≥1 token). */
  private[queries] val BpeDocCountsCte: String =
    s"""dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents),
       |bcnt AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_words,
       |    CAST(SUM(len(string_split(trim($BpeApplied), '  '))) AS INT) AS n_bpe
       |  FROM dw GROUP BY doc_id)""".stripMargin

  val textBpeTrainSql: String =
    s"""WITH $BpeTrainCtes,
       |$BpeDocCountsCte
       |SELECT doc_id, n_words, n_bpe FROM bcnt ORDER BY doc_id""".stripMargin

  /** The learned merge table itself, certified row-by-row: rank, the
    * merged pair, and the resulting symbol — the artifact a tokenizer
    * deployment ships, proven identical between the driver trainer and
    * the SQL training replay.
    */
  def textBpeVocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = graft.functions.Bpe.trainMerges(Tables(s, dir, "documents"),
      "doc_id", "text", sampleN = 64, nMerges = BpeMergeRounds)
    merges.zipWithIndex
      .map { case (p, i) => (i + 1, p, p.replace(" ", "")) }
      .toDF("rank", "pair", "merged")
      .orderBy($"rank")
  }

  /** Full BPE ENCODE: the trained merges applied to whole documents,
    * emitting the actual subword sequence (doc, position, token) — the
    * artifact a training pipeline feeds the model, completing the
    * count-only textBpeTrain. Bounded to the 3 lowest-id docs so the
    * oracle (training replay + per-word nested replace + positional
    * unnest) stays tractable; the Spark side is a narrow map either
    * way (literal replace() fold per word, flatten, posexplode).
    */
  def textBpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val merges = graft.functions.Bpe.trainMerges(docs, "doc_id", "text",
      sampleN = 64, nMerges = BpeMergeRounds)
    docs.filter($"doc_id" < 3)
      .select($"doc_id", posexplode(flatten(transform(
        graft.functions.TextFunctions.tokens($"text"),
        w => graft.functions.Bpe.symbolsCol(
          graft.functions.Bpe.applyMergesCol(w, merges))))))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("token"))
      .orderBy($"doc_id", $"pos")
  }

  // the merge-table subqueries can't ride inside a DuckDB lambda, so the
  // apply runs at ROW level: words unnest with their position, each word
  // splits to its subwords, and the global token position is the running
  // sum of prior words' subword counts plus the within-word index
  val textBpeEncodeSql: String =
    s"""WITH $BpeTrainCtes,
       |dw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
       |  FROM documents WHERE doc_id < 3),
       |wpos AS (SELECT doc_id, unnest(list_transform(range(len(ws)),
       |    i -> {'wp': i + 1, 'word': ws[i + 1]})) AS u FROM dw),
       |words AS (SELECT doc_id, u.wp AS wp, u.word AS word FROM wpos),
       |wt AS (SELECT doc_id, wp, string_split(trim($BpeApplied), '  ') AS tk FROM words),
       |woff AS (SELECT doc_id, tk,
       |    SUM(len(tk)) OVER (PARTITION BY doc_id ORDER BY wp
       |      ROWS UNBOUNDED PRECEDING) - len(tk) AS off FROM wt),
       |sel AS (SELECT doc_id, off, unnest(list_transform(range(len(tk)),
       |    i -> {'i': i + 1, 'token': tk[i + 1]})) AS v FROM woff)
       |SELECT doc_id, CAST(off + v.i AS INT) AS pos, v.token AS token
       |FROM sel ORDER BY doc_id, pos""".stripMargin

  /** Count-Min heavy-hitter estimation over the token stream
    * ([[graft.functions.Sketches]] — d=4 × w=1024 salted-md5 counters):
    * the 20 most frequent tokens with exact count beside the CMS
    * estimate. Deterministic registers mean the oracle rebuilds the
    * counter matrix and every point estimate exactly; the n_est ≥
    * n_exact overestimate-only invariant is spec-pinned. Scale: the
    * counter matrix is ≤ 4096 rows whatever the corpus, built in one
    * partial-agg groupBy.
    */
  def sketchCms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val S = graft.functions.Sketches
    val cnt = Tables(s, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
    def buckets = posexplode(array((0 until S.CmsD).map(i => S.cmsBucket($"tok", i)): _*))
    val counters = cnt.select($"tok", $"c", buckets)
      .select($"c", $"pos".as("row"), $"col".as("bucket"))
      .groupBy($"row", $"bucket").agg(sum($"c").as("cv"))
    cnt.orderBy($"c".desc, $"tok").limit(20)
      .select($"tok", $"c".as("n_exact"), buckets)
      .select($"tok", $"n_exact", $"pos".as("row"), $"col".as("bucket"))
      .join(counters, Seq("row", "bucket"))
      .groupBy($"tok", $"n_exact").agg(min($"cv").as("n_est"))
      .orderBy($"n_exact".desc, $"tok")
  }

  val sketchCmsSql: String =
    s"""WITH tk AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents),
       |cnt AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
       |wb AS (SELECT tok, c, r,
       |    CAST(concat('0x', substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8)) AS BIGINT)
       |      % ${graft.functions.Sketches.CmsW} AS bucket
       |  FROM cnt CROSS JOIN range(${graft.functions.Sketches.CmsD}) t(r)),
       |counters AS (SELECT r, bucket, CAST(SUM(c) AS BIGINT) AS cv FROM wb GROUP BY r, bucket),
       |top AS (SELECT tok, c AS n_exact FROM cnt ORDER BY c DESC, tok LIMIT 20),
       |tb AS (SELECT t.tok, t.n_exact, w.r, w.bucket FROM top t JOIN wb w ON w.tok = t.tok)
       |SELECT tok, n_exact, MIN(cv) AS n_est FROM tb JOIN counters USING (r, bucket)
       |GROUP BY tok, n_exact ORDER BY n_exact DESC, tok""".stripMargin

  val textBpeVocabSql: String = {
    val rows = (0 until BpeMergeRounds).map { r =>
      s"SELECT ${r + 1} AS rank, p AS pair, replace(p, ' ', '') AS merged FROM m$r"
    }.mkString("\n  UNION ALL ")
    s"""WITH $BpeTrainCtes
       |SELECT CAST(rank AS INT) AS rank, pair, merged FROM (
       |  $rows)
       |ORDER BY rank""".stripMargin
  }

  val textBpeSql: String = {
    // SQL-escape the apostrophe in the contraction arm
    val rx = graft.functions.TextFunctions.BpePieceRx.replace("'", "''")
    val ws = graft.functions.TextFunctions.BpeWsClass
    s"""WITH p AS (SELECT lang, regexp_extract_all(text, '$rx') AS ps FROM documents),
       |c AS (SELECT lang, len(ps) AS all_p,
       |    len(list_filter(ps, x -> NOT regexp_matches(x, '^[$ws]+$$'))) AS content_p
       |  FROM p)
       |SELECT lang, CAST(SUM(all_p) AS BIGINT) AS pieces,
       |  CAST(SUM(content_p) AS BIGINT) AS content_pieces,
       |  CAST(MAX(content_p) AS BIGINT) AS max_doc_pieces,
       |  COUNT(*) AS docs
       |FROM c GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Per-document quality scoring; emits the lowest-quality k docs
    * (integer counts; the composite double is computed identically in
    * both engines).
    */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val st = graft.plans.NativeExpressions.textStats($"text")
    val nTok = col("st.n_tok").cast("double")
    val quality =
      least(nTok / lit(100.0), lit(1.0)) *
        (lit(1.0) - col("st.n_stop").cast("double") / greatest(nTok, lit(1.0))) *
        (lit(1.0) - col("st.n_punct").cast("double") /
          greatest(length($"text").cast("double"), lit(1.0)))
    Tables(s, dir, "documents")
      .select($"doc_id", $"text", st.as("st"))
      .select(
        $"doc_id",
        col("st.n_tok").as("n_tok"),
        col("st.n_stop").as("n_stop"),
        col("st.n_punct").as("n_punct"),
        quality.as("quality"))
      .orderBy($"quality", $"doc_id")
      .limit(100)
  }

  val textQualitySql: String =
    s"""SELECT doc_id, len($TokSql) AS n_tok,
       |  len(list_filter($TokSql, t -> t IN ($stopListSql))) AS n_stop,
       |  len(regexp_extract_all(text,'[.!?,;:]')) AS n_punct,
       |  least(CAST(len($TokSql) AS DOUBLE)/100.0, 1.0)
       |    * (1.0 - CAST(len(list_filter($TokSql, t -> t IN ($stopListSql))) AS DOUBLE)
       |        / greatest(CAST(len($TokSql) AS DOUBLE), 1.0))
       |    * (1.0 - CAST(len(regexp_extract_all(text,'[.!?,;:]')) AS DOUBLE)
       |        / greatest(CAST(length(text) AS DOUBLE), 1.0)) AS quality
       |FROM documents ORDER BY quality, doc_id LIMIT 100""".stripMargin

  /** Language-ID heuristic vs the labeled lang column: confusion counts. */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"lang", langId($"text").as("predicted"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"lang", $"predicted")
  }

  val textLangIdSql: String = {
    val scores = LangMarkers.map { case (l, ms) =>
      l -> s"len(list_filter($TokSql, t -> t IN (${ms.map(m => s"'$m'").mkString(", ")})))"
    }
    val mx = s"greatest(${scores.map(_._2).mkString(", ")})"
    val caseExpr = scores.init
      .map { case (l, sc) => s"WHEN $sc = $mx THEN '$l'" }
      .mkString("CASE ", " ", s" ELSE '${scores.last._1}' END")
    s"""SELECT lang, $caseExpr AS predicted, COUNT(*) AS cnt
       |FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
  }

  /** Content fingerprint (A6 sha-based ids, ts_converter.py:30-33,79-89). */
  def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }

  val textFingerprintSql: String =
    """SELECT doc_id, sha256(trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** E14 segment selection via JSONPath (em_elicit.py:33,50): pull `$.k`
    * out of the props JSON blob and aggregate it.
    */
  def extractProps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count($"k").as("n"))
      .orderBy($"event_type")
  }

  // json_extract_string mirrors Spark's get_json_object (robust to JSON
  // whitespace/sign variants, unlike a regex); BIGINT cast as above.
  val extractPropsSql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(json_extract_string(props,'$.k')) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** P8 decoding_dict recode (dig_tabular_import.py:265-288): dictionary
    * re-map with default_action=preserve, as a when-chain (broadcast-join
    * for big dicts — see MappingRules).
    */
  def ruleRecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded = when($"event_type" === "click", "tap")
      .when($"event_type" === "view", "impression")
      .when($"event_type" === "purchase", "conversion")
      .otherwise($"event_type")
    Tables(s, dir, "events")
      .select(decoded.as("action"), $"value")
      .groupBy($"action")
      .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
      .orderBy($"action")
  }

  val ruleRecodeSql: String =
    s"""SELECT CASE WHEN event_type='click' THEN 'tap'
       |  WHEN event_type='view' THEN 'impression'
       |  WHEN event_type='purchase' THEN 'conversion'
       |  ELSE event_type END AS action,
       |  COUNT(*) AS cnt, ${sqlSum("value")} AS sum_value
       |FROM events GROUP BY 1 ORDER BY action""".stripMargin

  /** P9 template concat (dig_tabular_import.py:320-342): "{brand} {type}
    * size {size}" title synthesis.
    */
  def ruleTemplate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .select(
        $"p_partkey",
        concat_ws(" ", $"p_brand", $"p_type", lit("size"), $"p_size".cast("string")).as("title"))
      .orderBy($"p_partkey")
  }

  val ruleTemplateSql: String =
    """SELECT p_partkey, concat_ws(' ', p_brand, p_type, 'size', CAST(p_size AS VARCHAR)) AS title
      |FROM part ORDER BY p_partkey""".stripMargin

  /** P11 guard predicate (regex over a field, dig_tabular_import.py:290-304). */
  def ruleGuard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .filter($"text".rlike("window (scan|merge)"))
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  val ruleGuardSql: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE regexp_matches(text, 'window (scan|merge)') ORDER BY doc_id""".stripMargin

  /** Bigram frequency: top token 2-grams across the corpus (n-gram
    * language statistics; narrow shingle map + one count shuffle).
    */
  def textBigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(explode(shingles($"text", 2)).as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"bigram")
      .limit(50)
  }

  val textBigramsSql: String =
    """SELECT bigram, COUNT(*) AS cnt FROM (
      |  SELECT unnest(list_transform(range(greatest(len(t)-1, 0)),
      |    i -> t[i+1] || ' ' || t[i+2])) AS bigram
      |  FROM (SELECT regexp_extract_all(lower(text),'[a-z0-9]+') AS t FROM documents))
      |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin

  /** Training-data cleaning funnel (the composition a real 100 TB
    * pipeline runs): language → quality gate (token count + stopword
    * ratio, integer-exact) → exact near-dup collapse by content
    * fingerprint — emitted as per-language retention stats. One narrow
    * map over the corpus + a single aggregation: no extra shuffle per
    * stage, the funnel IS one pass.
    */
  def pipelineClean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val st = graft.plans.NativeExpressions.textStats($"text")
    val gate = col("st.n_tok") >= 30 && col("st.n_stop") * 2 < col("st.n_tok")
    Tables(s, dir, "documents")
      .select($"lang", st.as("st"), fingerprint($"text").as("fp"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("docs"),
        count(when(gate, lit(1))).as("kept"),
        countDistinct(when(gate, col("fp"))).as("unique_kept"))
      .orderBy($"lang")
  }

  val pipelineCleanSql: String =
    s"""SELECT lang, COUNT(*) AS docs,
       |  COUNT(CASE WHEN len($TokSql) >= 30
       |    AND len(list_filter($TokSql, t -> t IN ($stopListSql))) * 2 < len($TokSql)
       |    THEN 1 END) AS kept,
       |  COUNT(DISTINCT CASE WHEN len($TokSql) >= 30
       |    AND len(list_filter($TokSql, t -> t IN ($stopListSql))) * 2 < len($TokSql)
       |    THEN sha256(trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g'))) END) AS unique_kept
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** TF-IDF keyword extraction: top-5 terms per document ranked by an
    * ALL-INTEGER score, tf · ⌊10⁶·N/df⌋ — raw-idf scaled to a fixed
    * point so the ranking key is exact in both engines (a double
    * tf·log(N/df) key can flip ranks on the last ulp; the log is
    * monotone in N/df, so for ranking the rational form loses
    * nothing). Classic topology: token explode → per-doc tf → df over
    * the vocabulary → join back — two vocabulary-sized shuffles, and
    * the per-doc top-5 window is keyed by doc_id (never global).
    */
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(s, dir, "documents")
      .select($"doc_id", explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
    val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val n = toks.select($"doc_id").distinct().agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "tok").crossJoin(broadcast(n))
      .select($"doc_id", $"tok", $"tf", $"df",
        // floor division matching DuckDB `//` on positive operands:
        // (a - a mod b) / b is representable exactly in double here
        // (quotient ≤ 10⁶·N/1 < 2^53)
        ($"tf" * ((lit(1000000L) * $"n" - pmod(lit(1000000L) * $"n", $"df")) / $"df")
          .cast("long")).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"tok")))
      .filter($"rank" <= 5)
      .select($"doc_id", $"rank", $"tok", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rank")
  }

  val textTfidfSql: String =
    s"""WITH tk AS (SELECT doc_id, unnest($TokSql) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY doc_id, tok),
       |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
       |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tk),
       |sc AS (SELECT doc_id, tok, tf, df, tf * ((1000000 * n) // df) AS score
       |  FROM tf JOIN df USING (tok) CROSS JOIN n),
       |rk AS (SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, tok) AS rank FROM sc)
       |SELECT doc_id, rank, tok, tf, df, score
       |FROM rk WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  /** STREAMING Count-Min run in bounded mode
    * ([[graft.streaming.StreamingCms]] — one long of state per counter,
    * d×w total whatever the stream length): running totals fold by max
    * (counts are additive and monotone) into the SAME counter matrix as
    * the batch sketch, so the probe emits byte-identical estimates and
    * the batch sketch_cms oracle certifies the stream plane.
    */
  def streamCms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val S = graft.functions.Sketches
    // r12: the per-token d-way md5 bucket kernel ran single-task off the
    // one-split documents scan (profiled 1.8 s) — spread first (no-op at
    // scale where natural splits exceed the core count)
    val toks = graft.Tables.spreadToWidth(Tables(s, dir, "documents"))
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
    def buckets = posexplode(array((0 until S.CmsD).map(i => S.cmsBucket($"tok", i)): _*))
    val in = toks.select(buckets)
      .select($"pos".as("row"), $"col".as("bucket"), lit(1L).as("w"))
      .as[graft.streaming.StreamingCms.CntIn]
    val counters = graft.streaming.StreamingCms.counters(s, in).toDF()
      .groupBy($"row", $"bucket").agg(max($"c").as("cv"))
    val cnt = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
    cnt.orderBy($"c".desc, $"tok").limit(20)
      .select($"tok", $"c".as("n_exact"), buckets)
      .select($"tok", $"n_exact", $"pos".as("row"), $"col".as("bucket"))
      .join(counters, Seq("row", "bucket"))
      .groupBy($"tok", $"n_exact").agg(min($"cv").as("n_est"))
      .orderBy($"n_exact".desc, $"tok")
  }

  /** Bigram language model: P(w₂ | w₁) = c(w₁w₂)/c(w₁·) with the top-3
    * continuations per head token (heads with ≥ 100 bigram occurrences
    * — the next-token-prediction statistic a corpus LM report leads
    * with). c(w₁·) is the SUM of the head's bigram counts, so the
    * conditional is exactly normalized by construction; counts are
    * ints, one division per row, rank selection keyed per head.
    */
  def textBigramLm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(s, dir, "documents")
      .select(graft.functions.TextFunctions.tokens($"text").as("t"))
    val bg = toks.select(explode(zip_with($"t", slice($"t", lit(2), size($"t")),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      // zip_with pads the shorter side: the final (last-token, null)
      // row is not a bigram
      .filter($"b.w2".isNotNull)
      .select($"b.w1", $"b.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val heads = bg.groupBy($"w1").agg(sum($"c12").as("c1"))
    bg.join(heads.filter($"c1" >= 100), "w1")
      .withColumn("p", $"c12".cast("double") / $"c1".cast("double"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"w1").orderBy($"c12".desc, $"w2")))
      .filter($"rank" <= 3)
      .select($"w1", $"rank", $"w2", $"c12", $"c1", $"p")
      .orderBy($"w1", $"rank")
  }

  val textBigramLmSql: String =
    s"""WITH tk AS (SELECT $TokSql AS t FROM documents),
       |bg AS (SELECT t[i+1] AS w1, t[i+2] AS w2
       |  FROM tk, UNNEST(range(greatest(len(t) - 1, 0))) AS u(i)),
       |cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
       |hd AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM cb GROUP BY w1),
       |rk AS (SELECT cb.w1, w2, c12, c1,
       |    CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p,
       |    ROW_NUMBER() OVER (PARTITION BY cb.w1 ORDER BY c12 DESC, w2) AS rank
       |  FROM cb JOIN hd ON cb.w1 = hd.w1 WHERE c1 >= 100)
       |SELECT w1, rank, w2, c12, c1, p FROM rk WHERE rank <= 3
       |ORDER BY w1, rank""".stripMargin

  /** Collocation mining by pointwise mutual information: PMI(w₁,w₂) =
    * ln(N·c₁₂ / (c₁·c₂)) over bigram events, with the head/tail
    * marginals taken from the bigram table itself so everything is
    * exactly normalized integer counting. The ratio under the log is
    * ONE division of two exact BIGINT products (< 2^53, so the double
    * casts are exact) — bit-identical cross-engine — and the top-30
    * selection ORDERS BY THAT RATIO, not the log, so ln's 1-ulp
    * wobble (the stats_entropy lesson) can't flip the cutoff; the
    * emitted PMI is rounded to 4 decimals. One keyed aggregate per
    * marginal, candidate set pre-pruned by support ≥ 20.
    */
  def textPmi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables(s, dir, "documents")
      .select(graft.functions.TextFunctions.tokens($"text").as("t"))
    val bg = toks.select(explode(zip_with($"t", slice($"t", lit(2), size($"t")),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .filter($"b.w2".isNotNull)
      .select($"b.w1", $"b.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val heads = bg.groupBy($"w1").agg(sum($"c12").as("c1"))
    val tails = bg.groupBy($"w2").agg(sum($"c12").as("c2"))
    val n = bg.agg(sum($"c12").as("n"))
    bg.filter($"c12" >= 20)
      .join(heads, "w1").join(tails, "w2")
      .crossJoin(broadcast(n))
      .withColumn("ratio",
        ($"c12" * $"n").cast("double") / ($"c1" * $"c2").cast("double"))
      .orderBy($"ratio".desc, $"w1", $"w2").limit(30)
      .select($"w1", $"w2", $"c12", $"c1", $"c2",
        round(log($"ratio"), 4).as("pmi"))
  }

  val textPmiSql: String =
    s"""WITH tk AS (SELECT $TokSql AS t FROM documents),
       |bg AS (SELECT t[i+1] AS w1, t[i+2] AS w2
       |  FROM tk, UNNEST(range(greatest(len(t) - 1, 0))) AS u(i)),
       |cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
       |hd AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM cb GROUP BY w1),
       |tl AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM cb GROUP BY w2),
       |nn AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM cb),
       |r AS (SELECT cb.w1, cb.w2, c12, c1, c2,
       |    CAST(c12 * n AS DOUBLE) / CAST(c1 * c2 AS DOUBLE) AS ratio
       |  FROM cb JOIN hd ON cb.w1 = hd.w1 JOIN tl ON cb.w2 = tl.w2
       |  CROSS JOIN nn WHERE c12 >= 20)
       |SELECT w1, w2, c12, c1, c2, round(ln(ratio), 4) AS pmi
       |FROM r ORDER BY ratio DESC, w1, w2 LIMIT 30""".stripMargin

  /** Per-source vocabulary profile: token volume, distinct vocabulary,
    * hapax legomena (frequency-1 types — the Zipf-tail health signal a
    * corpus report leads with), and type-token ratio. One tokenize +
    * one (source, token) count aggregate; everything is integer until
    * the single TTR division. The hapax share of vocabulary is the
    * standard contamination/boilerplate tell: synthetic or templated
    * sources collapse it toward zero.
    */
  def textVocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val nDocs = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val cnt = docs
      .select($"source", explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .groupBy($"source", $"t").agg(count(lit(1)).as("c"))
    cnt.groupBy($"source")
      .agg(sum($"c").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("hapax"))
      .join(nDocs, "source")
      .select($"source", $"n_docs", $"n_tokens", $"vocab", $"hapax",
        ($"vocab".cast("double") / $"n_tokens".cast("double")).as("ttr"))
      .orderBy($"source")
  }

  val textVocabSql: String =
    s"""WITH tk AS (SELECT source, unnest($TokSql) AS t FROM documents),
       |cnt AS (SELECT source, t, COUNT(*) AS c FROM tk GROUP BY 1, 2),
       |v AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS vocab,
       |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
       |  FROM cnt GROUP BY source),
       |nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
       |SELECT v.source, n_docs, n_tokens, vocab, hapax,
       |  CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
       |FROM v JOIN nd ON v.source = nd.source ORDER BY v.source""".stripMargin

  /** Zipf's-law fit: OLS of ln(freq) on ln(rank) over the top-100
    * tokens — slope ≈ −1 is the natural-corpus signature, deviations
    * flag templated/synthetic text. Ranks come from a deterministic
    * top-k (freq desc, token tiebreak; the window runs on the
    * 100-row result, never the corpus). The four regression moments
    * fold over the rank-ordered term list in ONE struct whose fields
    * each read only their own accumulator slot — diagonal updates are
    * safe under both functional (Spark) and sequential (DuckDB
    * struct_pack) fold evaluation, the ts_cusum lesson applied.
    * ln wobble → slope/intercept rounded to 4 decimals.
    */
  def textZipf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val top = Tables(s, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"tok").limit(100)
    val ranked = top.withColumn("rank",
        row_number().over(Window.orderBy($"c".desc, $"tok")))
      .withColumn("x", log($"rank".cast("double")))
      .withColumn("y", log($"c".cast("double")))
    val folded = ranked
      .agg(sort_array(collect_list(struct($"rank", $"x", $"y"))).as("a"),
        count(lit(1)).as("n"))
      .select($"n", aggregate($"a",
        struct(lit(0.0).as("sx"), lit(0.0).as("sy"),
          lit(0.0).as("sxy"), lit(0.0).as("sxx")),
        (acc, t) => struct(
          (acc.getField("sx") + t.getField("x")).as("sx"),
          (acc.getField("sy") + t.getField("y")).as("sy"),
          (acc.getField("sxy") + t.getField("x") * t.getField("y")).as("sxy"),
          (acc.getField("sxx") + t.getField("x") * t.getField("x")).as("sxx")))
        .as("m"))
    // degenerate corpora (n < 2 → zero x-variance) emit NULL under the
    // ANSI double/0 guard
    folded.select($"n",
        ($"n" * $"m.sxx" - $"m.sx" * $"m.sx").as("den"),
        ($"n" * $"m.sxy" - $"m.sx" * $"m.sy").as("num"),
        $"m.sx".as("sx"), $"m.sy".as("sy"))
      .select($"n",
        round(when($"den" =!= 0.0, $"num" / $"den"), 4).as("zipf_slope"),
        round(when($"den" =!= 0.0,
          ($"sy" - ($"num" / $"den") * $"sx") / $"n"), 4).as("zipf_intercept"))
  }

  val textZipfSql: String =
    s"""WITH tk AS (SELECT unnest($TokSql) AS tok FROM documents),
       |top AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok
       |  ORDER BY c DESC, tok LIMIT 100),
       |rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rank FROM top),
       |tm AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS x,
       |    ln(CAST(c AS DOUBLE)) AS y FROM rk),
       |fd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    (list_reduce(list_prepend(
       |      struct_pack(sx := 0.0e0, sy := 0.0e0, sxy := 0.0e0, sxx := 0.0e0),
       |      list(struct_pack(sx := x, sy := y, sxy := 0.0e0, sxx := 0.0e0)
       |        ORDER BY rank)),
       |      (acc, t) -> struct_pack(
       |        sx := acc.sx + t.sx, sy := acc.sy + t.sy,
       |        sxy := acc.sxy + t.sx * t.sy,
       |        sxx := acc.sxx + t.sx * t.sx))) AS m
       |  FROM tm),
       |sl AS (SELECT n,
       |    (n * m.sxx - m.sx * m.sx) AS den,
       |    (n * m.sxy - m.sx * m.sy) AS num,
       |    m.sx AS sx, m.sy AS sy FROM fd)
       |SELECT n,
       |  round(CASE WHEN den <> 0 THEN num / den END, 4) AS zipf_slope,
       |  round(CASE WHEN den <> 0 THEN (sy - (num / den) * sx) / n END, 4)
       |    AS zipf_intercept
       |FROM sl""".stripMargin

  /** Lexical-diversity indices per source: Simpson's D = Σc(c−1) /
    * (N(N−1)) (repeat-draw collision probability) and the Herfindahl
    * concentration Σc²/N² — both pure integer moments with one final
    * division, bit-exact unrounded. At extreme corpus sizes the
    * squared terms want DECIMAL(38) accumulators; BIGINT holds to
    * ~3·10⁹ tokens per source, documented here.
    */
  def textDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cnt = Tables(s, dir, "documents")
      .select($"source", explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .groupBy($"source", $"t").agg(count(lit(1)).as("c"))
    cnt.groupBy($"source")
      .agg(sum($"c").as("n_tokens"),
        sum($"c" * ($"c" - 1)).as("s_coll"),
        sum($"c" * $"c").as("s_sq"))
      .select($"source", $"n_tokens",
        // a single-token source has no repeat-draw pair: NULL, not 0/0
        when($"n_tokens" > 1, $"s_coll".cast("double") /
          ($"n_tokens" * ($"n_tokens" - 1)).cast("double")).as("simpson_d"),
        ($"s_sq".cast("double") /
          ($"n_tokens" * $"n_tokens").cast("double")).as("herfindahl"))
      .orderBy($"source")
  }

  val textDiversitySql: String =
    s"""WITH tk AS (SELECT source, unnest($TokSql) AS t FROM documents),
       |cnt AS (SELECT source, t, COUNT(*) AS c FROM tk GROUP BY 1, 2),
       |m AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    CAST(SUM(c * (c - 1)) AS BIGINT) AS s_coll,
       |    CAST(SUM(c * c) AS BIGINT) AS s_sq
       |  FROM cnt GROUP BY source)
       |SELECT source, n_tokens,
       |  CASE WHEN n_tokens > 1 THEN CAST(s_coll AS DOUBLE)
       |    / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) END AS simpson_d,
       |  CAST(s_sq AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE) AS herfindahl
       |FROM m ORDER BY source""".stripMargin

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs; each word scores deg/freq where
    * deg sums the lengths of phrases containing it (within-phrase
    * co-occurrence incl. itself) and freq counts its occurrences; a
    * phrase scores the sum of its word scores. Top-20 phrases by
    * (score desc, phrase). Everything is integer until the deg/freq
    * divisions, and the per-phrase word-score sum folds in WORD ORDER
    * (sort_array ≡ list ORDER BY position) so the emitted doubles hash
    * bit-for-bit. Phrase ids come from a running stopword count in a
    * per-doc keyed window — docs are bounded, no global sort; word
    * stats are one vocabulary-sized aggregate.
    */
  def textRake(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(s, dir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id", posexplode(tokens($"text")))
      .withColumnRenamed("col", "w")
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val ph = toks
      .withColumn("pid",
        sum(when($"w".isin(Stopwords: _*), 1L).otherwise(0L)).over(w))
      .filter(!$"w".isin(Stopwords: _*))
    val phrases = ph.groupBy($"doc_id", $"pid")
      .agg(sort_array(collect_list(struct($"pos", $"w"))).as("ws"))
      .select($"doc_id", $"pid",
        transform($"ws", x => x.getField("w")).as("words"))
      .withColumn("len", size($"words").cast("long"))
      .withColumn("phrase", concat_ws(" ", $"words"))
    val wordStats = phrases
      .select(explode($"words").as("w"), $"len")
      .groupBy($"w")
      .agg(count(lit(1)).as("freq"), sum($"len").as("deg"))
    val pw = phrases.select($"doc_id", $"pid", $"phrase", posexplode($"words"))
      .withColumnRenamed("col", "w").withColumnRenamed("pos", "wi")
    pw.join(wordStats, "w")
      .groupBy($"doc_id", $"pid", $"phrase")
      .agg(sort_array(collect_list(struct($"wi", $"deg", $"freq"))).as("xs"))
      .withColumn("score", aggregate(
        transform($"xs", x =>
          x.getField("deg").cast("double") / x.getField("freq").cast("double")),
        lit(0.0), (a, b) => a + b))
      .groupBy($"phrase")
      .agg(count(lit(1)).as("cnt"), max($"score").as("score"))
      .orderBy($"score".desc, $"phrase")
      .limit(20)
      .select($"phrase", $"cnt", $"score")
  }

  val textRakeSql: String =
    s"""WITH tk AS (SELECT doc_id, $TokSql AS t
       |  FROM documents WHERE text IS NOT NULL),
       |tok AS (SELECT doc_id, i AS pos, t[i+1] AS w
       |  FROM tk, UNNEST(range(len(t))) AS u(i)),
       |st AS (SELECT doc_id, pos, w,
       |    CASE WHEN w IN ($stopListSql) THEN 1 ELSE 0 END AS is_stop FROM tok),
       |pid0 AS (SELECT *, CAST(SUM(is_stop) OVER (PARTITION BY doc_id
       |    ORDER BY pos) AS BIGINT) AS pid FROM st),
       |ph AS (SELECT doc_id, pid, list(w ORDER BY pos) AS words
       |  FROM pid0 WHERE is_stop = 0 GROUP BY doc_id, pid),
       |ph2 AS (SELECT doc_id, pid, words, CAST(len(words) AS BIGINT) AS len,
       |    array_to_string(words, ' ') AS phrase FROM ph),
       |ws AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
       |    CAST(SUM(len) AS BIGINT) AS deg FROM (
       |    SELECT unnest(words) AS w, len FROM ph2) GROUP BY w),
       |pw AS (SELECT doc_id, pid, phrase, i AS wi, words[i+1] AS w
       |  FROM ph2, UNNEST(range(len(words))) AS u(i)),
       |sc AS (SELECT p.doc_id, p.pid, p.phrase,
       |    CAST(list_reduce(list_prepend(0.0e0,
       |      list_transform(list(struct_pack(i := wi, d := deg, f := freq) ORDER BY wi),
       |        x -> CAST(x.d AS DOUBLE) / CAST(x.f AS DOUBLE))),
       |      (a, b) -> a + b) AS DOUBLE) AS score
       |  FROM pw p JOIN ws ON ws.w = p.w GROUP BY p.doc_id, p.pid, p.phrase),
       |agg AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    MAX(score) AS score FROM sc GROUP BY phrase)
       |SELECT phrase, cnt, score FROM agg
       |ORDER BY score DESC, phrase LIMIT 20""".stripMargin

  /** Signed-lexicon scoring (the AFINN/VADER-style shape, weights
    * configurable; demo lexicon over this corpus's performance
    * vocabulary): per-doc positive/negative hit mass and net polarity =
    * net/token-count. Integer sums until ONE division — the narrow
    * scan-bound shape of the rest of the text suite.
    */
  def textSentiment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables(s, dir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id", explode(tokens($"text")).as("w"))
    val wt = when($"w" === "fast", 2L).when($"w" === "big", 1L)
      .when($"w" === "slow", -2L).when($"w" === "small", -1L)
      .when($"w" === "dup", -2L).otherwise(0L)
    toks.withColumn("wt", wt)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"wt" > 0L, $"wt").otherwise(0L)).as("pos_sum"),
        sum(when($"wt" < 0L, -$"wt").otherwise(0L)).as("neg_sum"),
        sum($"wt").as("net"))
      .select($"doc_id", $"n_tokens", $"pos_sum", $"neg_sum", $"net",
        ($"net".cast("double") / $"n_tokens".cast("double")).as("polarity"))
      .orderBy($"doc_id")
  }

  val textSentimentSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($TokSql) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |wt AS (SELECT doc_id, CASE WHEN w = 'fast' THEN 2 WHEN w = 'big' THEN 1
       |    WHEN w = 'slow' THEN -2 WHEN w = 'small' THEN -1
       |    WHEN w = 'dup' THEN -2 ELSE 0 END AS wt FROM tok),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(CASE WHEN wt > 0 THEN wt ELSE 0 END) AS BIGINT) AS pos_sum,
       |    CAST(SUM(CASE WHEN wt < 0 THEN -wt ELSE 0 END) AS BIGINT) AS neg_sum,
       |    CAST(SUM(wt) AS BIGINT) AS net
       |  FROM wt GROUP BY doc_id)
       |SELECT doc_id, n_tokens, pos_sum, neg_sum, net,
       |  CAST(net AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS polarity
       |FROM agg ORDER BY doc_id""".stripMargin

  /** RAG-style document chunking: greedy word-budget packing (chunk ≤
    * 120 chars including joining spaces, at least one word per chunk) —
    * the retrieval-side complement of `pipeline_pack` (which packs
    * whole docs into training sequences; this SPLITS docs into
    * indexable chunks). Emits one row per chunk with its exact
    * reassembled text's md5, so the oracle certifies byte-identical
    * chunk boundaries AND content. The greedy scan is a per-doc list
    * fold (all-integer state `[cur_len, chunk_idx, assignment…]` —
    * appended assignments make the fold emit per-word output, not just
    * final state); chunk reassembly is a bounded per-doc transform.
    * Scale: embarrassingly parallel over docs, zero shuffles before
    * the final sort.
    */
  def textChunks(s: SparkSession, dir: String): DataFrame = {
    val B = 120L
    // r12: the whole chunk-assignment fold ran inside the single-split
    // scan's one task (profiled 1.9 s) — spread first
    val docs = graft.Tables.spreadToWidth(Tables(s, dir, "documents"))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("lens", transform(col("ws"), w => length(w).cast("long")))
    val folded = docs.withColumn("acc",
      aggregate(col("lens"), array(lit(0L), lit(0L)), (acc, l) => {
        val cur = element_at(acc, 1)
        val idx = element_at(acc, 2)
        val newChunk = cur > 0L && cur + 1L + l > lit(B)
        val idxN = when(newChunk, idx + 1L).otherwise(idx)
        val curN = when(newChunk, l)
          .otherwise(when(cur === 0L, l).otherwise(cur + 1L + l))
        concat(array(curN, idxN),
          slice(acc, lit(3), size(acc) - 2), array(idxN))
      }))
      .withColumn("asg", slice(col("acc"), lit(3), size(col("acc")) - 2))
      // cache barrier: stops CollapseProject re-inlining the assignment
      // fold into every element of the per-chunk reassembly transforms
      // below (measured 32 s → ~1 s at sf0.1)
      .select(col("doc_id"), col("ws"), col("asg"))
      .cache()
    val chunks = folded
      .withColumn("pairs", zip_with(col("ws"), col("asg"),
        (w, a) => struct(w.as("w"), a.as("a"))))
      .withColumn("chunks",
        transform(sequence(lit(0L), element_at(col("asg"), size(col("asg")))),
          k => array_join(
            transform(filter(col("pairs"), p => p.getField("a") === k),
              p => p.getField("w")), " ")))
      .select(col("doc_id"), posexplode(col("chunks")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        size(split(col("col"), " ")).cast("long").as("n_words"),
        length(col("col")).cast("long").as("n_chars"),
        md5(col("col")).as("chunk_md5"))
    chunks.orderBy(col("doc_id"), col("chunk_idx"))
  }

  val textChunksSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |l AS (SELECT doc_id, ws,
      |    list_transform(ws, w -> CAST(length(w) AS BIGINT)) AS lens FROM d),
      |f AS (SELECT doc_id, ws,
      |    list_reduce(list_prepend([0, 0]::BIGINT[],
      |        list_transform(lens, x -> [x, 0]::BIGINT[])),
      |      (acc, x) -> [
      |        CASE WHEN acc[1] > 0 AND acc[1] + 1 + x[1] > 120 THEN x[1]
      |             WHEN acc[1] = 0 THEN x[1]
      |             ELSE acc[1] + 1 + x[1] END,
      |        acc[2] + CASE WHEN acc[1] > 0 AND acc[1] + 1 + x[1] > 120
      |                      THEN 1 ELSE 0 END]::BIGINT[]
      |        || acc[3:]
      |        || [acc[2] + CASE WHEN acc[1] > 0 AND acc[1] + 1 + x[1] > 120
      |                          THEN 1 ELSE 0 END]) AS acc
      |  FROM l),
      |a AS (SELECT doc_id, ws, acc[3:] AS asg FROM f),
      |c AS (SELECT doc_id, list_transform(range(0, asg[len(asg)] + 1),
      |    k -> struct_pack(ci := k,
      |      c := array_to_string(list_transform(
      |        list_filter(list_zip(ws, asg), p -> p[2] = k),
      |        p -> p[1]), ' '))) AS cl
      |  FROM a),
      |x AS (SELECT doc_id, unnest(cl) AS u FROM c)
      |SELECT doc_id, CAST(u.ci AS BIGINT) AS chunk_idx,
      |  CAST(len(string_split(u.c, ' ')) AS BIGINT) AS n_words,
      |  CAST(length(u.c) AS BIGINT) AS n_chars,
      |  md5(u.c) AS chunk_md5
      |FROM x ORDER BY doc_id, chunk_idx""".stripMargin

  /** Phonetic blocking for entity resolution: simplified Soundex over
    * every part-name word, with per-block sizes — the classic
    * cheap blocking key (Odell–Russell) that survives spelling noise
    * where `er_match`'s exact blocks and `kg_spellfix`'s edit
    * neighborhood don't. Variant implemented (documented): h/w are
    * treated like vowels (code 0 resets the adjacent-duplicate merge)
    * — the common "simplified Soundex"; classic examples still hold
    * (robert→r163), and on the driver vocabulary red/rod genuinely
    * collide into one r300 block (n_words=2) — the cross-spelling
    * recall exact blocking misses. The letter→digit map is ONE `translate` call
    * (identical semantics both engines); the adjacent-dedup runs as a
    * per-word 2-slot VARCHAR list fold. Scale: narrow map + one keyed
    * aggregation; as a join key it blocks candidate pairs exactly like
    * `er_match`'s blocked join.
    */
  def erSoundex(s: SparkSession, dir: String): DataFrame = {
    val codeMap = "01230120022455012623010202"
    val base = Tables(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("w0"))
      .withColumn("w", lower(col("w0")))
      .withColumn("cs",
        translate(col("w"), "abcdefghijklmnopqrstuvwxyz", codeMap))
      .withColumn("folded", aggregate(
        transform(sequence(lit(2), greatest(length(col("cs")), lit(2))),
          i => col("cs").substr(i, lit(1))),
        array(lit(""), substring(col("cs"), 1, 1)),
        (acc, c) => array(
          concat(element_at(acc, 1),
            when(c =!= element_at(acc, 2) && c =!= "0" && c =!= "", c)
              .otherwise(lit(""))),
          c)))
      .withColumn("sdx", concat(substring(col("w"), 1, 1),
        rpad(substring(element_at(col("folded"), 1), 1, 3), 3, "0")))
    base.groupBy(col("sdx"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("w")).as("n_words"))
      .orderBy(col("sdx"))
  }

  val erSoundexSql: String =
    """WITH b AS (SELECT lower(unnest(string_split(p_name, ' '))) AS w FROM part),
      |cs AS (SELECT w, translate(w, 'abcdefghijklmnopqrstuvwxyz',
      |    '01230120022455012623010202') AS cs FROM b),
      |f AS (SELECT w, list_reduce(list_prepend(
      |      ['', substr(cs, 1, 1)]::VARCHAR[],
      |      list_transform(range(2, greatest(length(cs), 2) + 1),
      |        i -> [substr(cs, CAST(i AS INT), 1), '']::VARCHAR[])),
      |    (acc, x) -> [acc[1] ||
      |        CASE WHEN x[1] <> acc[2] AND x[1] <> '0' AND x[1] <> ''
      |             THEN x[1] ELSE '' END,
      |      x[1]]::VARCHAR[]) AS folded
      |  FROM cs),
      |k AS (SELECT w, substr(w, 1, 1) || rpad(substr(folded[1], 1, 3), 3, '0') AS sdx
      |  FROM f)
      |SELECT sdx, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
      |FROM k GROUP BY sdx ORDER BY sdx""".stripMargin

  /** Term burstiness (Church & Gale 1995): the variance-to-mean ratio
    * of each top-20 term's per-document count, zeros included — a
    * Poisson term has VMR ≈ 1, a "bursty" content word (clumping in
    * few documents) has VMR ≫ 1, so the ratio separates topical terms
    * from function words where raw frequency cannot. A curation
    * plane reads this next to text_zipf/text_vocab when choosing
    * stopword and keyword lists.
    *
    * Determinism: per-(term, doc) counts, term totals, and Σc² are
    * exact integers; docs WITHOUT the term enter through the closed
    * form (zeros add nothing to Σc or Σc², only to D), so no
    * densification is needed; mean = tot/D and the population
    * variance (Σc² − tot²/D)/D are one fixed chain each. Top-20
    * selection is (total DESC, term ASC) — fully ordered.
    *
    * Scale: one explode + two hash aggregations; the top-k sort runs
    * on the vocabulary table (the text_zipf shape), never the corpus.
    */
  def textBurstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val dTot = docs.agg(count(lit(1)).as("d"))
    val perDoc = docs
      .select($"doc_id", explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok", $"doc_id").agg(count(lit(1)).as("c"))
    val perTerm = perDoc.groupBy($"tok")
      .agg(sum($"c").as("tot"), count(lit(1)).as("n_docs"),
        sum(($"c" * $"c").cast("decimal(38,0)")).cast("long").as("sc2"))
      .orderBy($"tot".desc, $"tok").limit(20)
    perTerm.crossJoin(broadcast(dTot))
      .withColumn("mean", col("tot").cast("double") / col("d").cast("double"))
      .withColumn("variance",
        (col("sc2").cast("double") -
          col("tot").cast("double") * col("tot").cast("double") /
            col("d").cast("double")) / col("d").cast("double"))
      .withColumn("vmr", when(col("mean") > 0.0, col("variance") / col("mean")))
      .select($"tok", $"tot", $"n_docs", $"mean", $"vmr")
      .orderBy($"tot".desc, $"tok")
  }

  val textBurstinessSql: String =
    s"""WITH dt AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents),
       |pd AS (SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, unnest($TokSql) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |pt AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS tot,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(c * c) AS BIGINT) AS sc2
       |  FROM pd GROUP BY 1 ORDER BY tot DESC, tok LIMIT 20),
       |m AS (SELECT pt.*, dt.d,
       |    CAST(tot AS DOUBLE) / CAST(d AS DOUBLE) AS mean,
       |    (CAST(sc2 AS DOUBLE) - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)
       |      / CAST(d AS DOUBLE)) / CAST(d AS DOUBLE) AS variance
       |  FROM pt CROSS JOIN dt)
       |SELECT tok, tot, n_docs, mean,
       |  CASE WHEN mean > 0.0e0 THEN variance / mean END AS vmr
       |FROM m ORDER BY tot DESC, tok""".stripMargin

  /** Per-language tokenizer fertility (Ács 2019; Rust et al. 2021,
    * "How Good is Your Tokenizer?"): under the corpus-trained BPE
    * merges, how many subword tokens a word costs in each language —
    * THE multilingual-pipeline metric for tokenizer equity (a language
    * with 2× fertility pays 2× the context budget for the same text)
    * — plus subwords per 100 characters as the length-insensitive
    * companion. The merges come from the same 64-doc salted-hash
    * sample every BPE query trains on, so the oracle re-derives them
    * with the shared `BpeTrainCtes` unrolled-merge chain.
    *
    * Determinism: word/char/subword counts are exact integers summed
    * per language; the two ratios are one row-local double division
    * each. Scale shape: one narrow map per document (the
    * [[graft.functions.Bpe.bpeTokenCount]] replace-fold — no
    * per-subword explode), one alphabet-sized groupBy.
    */
  def textFertility(s: SparkSession, dir: String): DataFrame = {
    // r12: per-doc BPE token counting ran single-task (0.9 s) — spread
    val docs = graft.Tables.spreadToWidth(Tables(s, dir, "documents"))
    val merges = graft.functions.Bpe.trainMerges(docs, "doc_id", "text",
      sampleN = 64, nMerges = BpeMergeRounds)
    docs.select(col("lang"),
        graft.functions.TextFunctions.bindOnce(
          graft.functions.TextFunctions.tokens(col("text"))) { tv =>
          struct(size(tv).cast("long").as("ws"),
            aggregate(transform(tv, w => length(w)), lit(0),
              (a, n) => a + n).cast("long").as("chars"))
        }.as("c"),
        graft.functions.Bpe.bpeTokenCount(col("text"), merges)
          .cast("long").as("bpe"))
      .select(col("lang"), col("c.ws").as("ws"), col("c.chars").as("chars"),
        col("bpe"))
      .filter(col("ws") > 0L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("n_words"),
        sum(col("chars")).as("n_chars"), sum(col("bpe")).as("n_bpe"))
      .withColumn("fertility",
        col("n_bpe").cast("double") / col("n_words").cast("double"))
      .withColumn("bpe_per_100c",
        col("n_bpe").cast("double") * 100.0 / col("n_chars").cast("double"))
      .orderBy(col("lang"))
  }

  val textFertilitySql: String =
    s"""WITH $BpeTrainCtes,
       |dw AS (SELECT doc_id, lang,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |  FROM documents),
       |per AS (SELECT doc_id, lang, COUNT(*) AS ws,
       |    SUM(len(word)) AS chars,
       |    SUM(len(string_split(trim($BpeApplied), '  '))) AS bpe
       |  FROM dw GROUP BY doc_id, lang)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(ws) AS BIGINT) AS n_words,
       |  CAST(SUM(chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(bpe) AS BIGINT) AS n_bpe,
       |  CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility,
       |  CAST(SUM(bpe) AS DOUBLE) * 100.0 / CAST(SUM(chars) AS DOUBLE) AS bpe_per_100c
       |FROM per GROUP BY lang ORDER BY lang""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_fertility" -> (textFertility _),
    "text_burstiness" -> (textBurstiness _),
    "er_soundex" -> (erSoundex _),
    "text_chunks" -> (textChunks _),
    "text_rake" -> (textRake _),
    "text_sentiment" -> (textSentiment _),
    "text_zipf" -> (textZipf _),
    "text_diversity" -> (textDiversity _),
    "text_vocab" -> (textVocab _),
    "text_pmi" -> (textPmi _),
    "text_tfidf" -> (textTfidf _),
    "text_bigram_lm" -> (textBigramLm _),
    "stream_cms" -> (streamCms _),
    "pipeline_clean" -> (pipelineClean _),
    "text_bigrams" -> (textBigrams _),
    "text_tokens" -> (textTokens _),
    "text_bpe" -> (textBpe _),
    "text_bpe_train" -> (textBpeTrain _),
    "text_bpe_vocab" -> (textBpeVocab _),
    "text_bpe_encode" -> (textBpeEncode _),
    "sketch_cms" -> (sketchCms _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangId _),
    "text_fingerprint" -> (textFingerprint _),
    "extract_props" -> (extractProps _),
    "rule_recode" -> (ruleRecode _),
    "rule_template" -> (ruleTemplate _),
    "rule_guard" -> (ruleGuard _))

  val oracles: Map[String, String] = Map(
    "text_fertility" -> textFertilitySql,
    "text_burstiness" -> textBurstinessSql,
    "er_soundex" -> erSoundexSql,
    "text_chunks" -> textChunksSql,
    "text_rake" -> textRakeSql,
    "text_sentiment" -> textSentimentSql,
    "text_zipf" -> textZipfSql,
    "text_diversity" -> textDiversitySql,
    "text_vocab" -> textVocabSql,
    "text_pmi" -> textPmiSql,
    "text_tfidf" -> textTfidfSql,
    "text_bigram_lm" -> textBigramLmSql,
    // bounded-mode streaming CMS = the batch sketch, certified by the
    // SAME oracle (the stream_hll convention)
    "stream_cms" -> sketchCmsSql,
    "pipeline_clean" -> pipelineCleanSql,
    "text_bigrams" -> textBigramsSql,
    "text_tokens" -> textTokensSql,
    "text_bpe" -> textBpeSql,
    "text_bpe_train" -> textBpeTrainSql,
    "text_bpe_vocab" -> textBpeVocabSql,
    "text_bpe_encode" -> textBpeEncodeSql,
    "sketch_cms" -> sketchCmsSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangIdSql,
    "text_fingerprint" -> textFingerprintSql,
    "extract_props" -> extractPropsSql,
    "rule_recode" -> ruleRecodeSql,
    "rule_template" -> ruleTemplateSql,
    "rule_guard" -> ruleGuardSql)
}
