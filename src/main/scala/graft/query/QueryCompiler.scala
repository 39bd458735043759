package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The structured-query plane (SURVEY §2.6, Q1–Q13): typed constraints →
  * field resolution → weighted relevance scoring + facets, compiled to
  * one DataFrame plan over the long-format KgValue table.
  *
  * Reference pipeline (sandpaper coarse, config/etk/config.json:1-97):
  * predicate→type mapping (Q1), value normalization (Q2), constraint
  * expansion via synonym dicts (Q3/Q11), AtLeastOneField OR-combination
  * (Q4), type→field-path mapping (Q5), per-path weights (Q6), free-text
  * fallback (Q13), ranked + faceted execution (O1/A2).
  *
  * Scale: constraints filter the KgValue table on (field, key) — both
  * pushed to the Parquet scan — then one groupBy(doc_id) shuffle scores
  * and enforces all-constraints-matched. Facets are per-field partial
  * aggregations over the (small) hit set.
  */
object QueryCompiler {

  /** Q1+Q5+Q6: a constraint type resolves to weighted field paths. */
  final case class TypeMapping(fields: Seq[(String, Double)])

  /** Q3 constraint expanders (config/etk/config.json:16-23: Height and
    * Phone expanders generate equivalent unit/format variants). A
    * whitelist of named pure functions — no eval (SURVEY §7).
    */
  object Expanders {
    /** Phone formats: digits-only, +1-prefixed, dashed. */
    val phone: String => Seq[String] = { v =>
      val d = v.replaceAll("\\D", "")
      if (d.isEmpty) Nil
      else {
        val national = if (d.length == 11 && d.startsWith("1")) d.drop(1) else d
        val dashed =
          if (national.length == 10)
            Seq(s"${national.take(3)}-${national.slice(3, 6)}-${national.drop(6)}")
          else Nil
        (Seq(d, national, s"+1$national") ++ dashed).distinct
      }
    }

    /** Height units: 5'6" → inches and centimeters variants. */
    val height: String => Seq[String] = { v =>
      val ftIn = "(\\d)'(\\d{1,2})\"?".r.findFirstMatchIn(v.trim)
      val cm = "(\\d{2,3})\\s*cm".r.findFirstMatchIn(v.trim.toLowerCase)
      ftIn.map { m =>
        val inches = m.group(1).toInt * 12 + m.group(2).toInt
        Seq(s"${inches}in", s"${math.round(inches * 2.54)}cm", m.group(1) + "'" + m.group(2) + "\"")
      }.orElse(cm.map { m =>
        val c = m.group(1).toInt
        val inches = math.round(c / 2.54).toInt
        Seq(s"${c}cm", s"${inches}in", s"${inches / 12}'${inches % 12}\"")
      }).getOrElse(Nil)
    }

    val registry: Map[String, String => Seq[String]] =
      Map("phone" -> phone, "height" -> height)
  }

  /** Q11: per-type synonym expansion dictionary; Q3: named expanders. */
  final case class Catalog(
      typeFieldMappings: Map[String, TypeMapping],
      synonyms: Map[String, Map[String, Seq[String]]] = Map.empty,
      expanders: Map[String, String => Seq[String]] = Map.empty) {

    /** Q2+Q3+Q11: normalize, then expand to synonym + format variants. */
    def expand(ctype: String, value: String): Seq[String] = {
      val norm = value.toLowerCase.trim
      val syn = synonyms.getOrElse(ctype, Map.empty).getOrElse(norm, Nil)
      val exp = expanders.get(ctype).map(_(value)).getOrElse(Nil)
      (norm +: (syn ++ exp)).distinct
    }
  }

  final case class Constraint(ctype: String, value: String)

  final case class QuerySpec(
      constraints: Seq[Constraint],
      freeText: Option[String] = None,
      limit: Int = 50)

  /** Compile + execute: ranked hits (doc_id, score, matched) with every
    * constraint satisfied on ≥1 field (Q4 AtLeastOneField, clause
    * combination = filter) and free-text token overlap added to the
    * score (Q13, filters-to-shoulds Q9).
    */
  def search(kg: DataFrame, docs: DataFrame, docIdCol: String, textCol: String,
             spec: QuerySpec, catalog: Catalog): DataFrame = {
    val perConstraint = spec.constraints.zipWithIndex.map { case (c, i) =>
      val tm = catalog.typeFieldMappings.getOrElse(c.ctype, TypeMapping(Seq(c.ctype -> 1.0)))
      val variants = catalog.expand(c.ctype, c.value)
      val fieldWeight = tm.fields
        .map { case (f, w) => when(col("field") === f, lit(w)) }
        .reduce((a, b) => coalesce(a, b))
      kg.filter(col("field").isin(tm.fields.map(_._1): _*) &&
          col("key").isin(variants: _*))
        .select(col("doc_id"), lit(i).as("cid"), fieldWeight.as("w"))
    }
    // no constraints = the Q13 free-text-only mode: every doc matches
    // with kg_score 0 (an empty reduce would throw before planning)
    val matched =
      if (perConstraint.isEmpty)
        docs.select(col(docIdCol).cast("string").as("doc_id"),
          lit(0L).as("matched"), lit(0.0).as("kg_score"))
      else perConstraint.reduce(_.unionByName(_))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("cid")).as("matched"),
          sum(col("w")).cast("double").as("kg_score"))
        .filter(col("matched") === spec.constraints.length)

    val scored = spec.freeText match {
      case Some(q) =>
        // tokenize the QUERY exactly like the documents ([a-z0-9]+):
        // \W+ keeps underscores, which the doc tokenizer splits — an
        // underscore-bearing query token could otherwise never match
        val qTokens = "[a-z0-9]+".r
          .findAllIn(q.toLowerCase(java.util.Locale.ROOT)).toSeq.distinct
        val ftScore = size(array_intersect(
          array_distinct(TextFunctions.tokens(col(textCol))),
          array(qTokens.map(lit): _*))).cast("double")
        matched.join(docs.select(col(docIdCol).cast("string").as("doc_id"),
            ftScore.as("ft_score")), "doc_id")
          .withColumn("score", col("kg_score") + col("ft_score"))
      case None => matched.withColumn("score", col("kg_score"))
    }
    scored
      .select(col("doc_id"), col("score"), col("matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(spec.limit)
  }

  /** A2/O4 facets over a hit set: top-k keys per facet field. */
  def facets(kg: DataFrame, hits: DataFrame, fields: Seq[String], k: Int = 20): DataFrame = {
    kg.join(hits.select(col("doc_id")), "doc_id")
      .filter(col("field").isin(fields: _*))
      .groupBy(col("field"), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("field")).orderBy(col("cnt").desc, col("key"))))
      .filter(col("rank") <= k)
      .select(col("field"), col("key"), col("cnt"), col("rank"))
  }

  /** Q10 execution with timeout (config/etk/config.json:45, 180s): run
    * the collect under a job group and cancel it if the deadline passes —
    * the Spark analogue of the ES query timeout.
    */
  def executeWithTimeout(df: DataFrame, timeoutSec: Int,
                         groupId: String = "graft-query"): Either[String, Array[org.apache.spark.sql.Row]] = {
    val sc = df.sparkSession.sparkContext
    // Per-invocation group id: a shared id would make one query's
    // timeout cancel every concurrently running query in the group.
    val gid = s"$groupId-${java.util.UUID.randomUUID()}"
    // Job-group local properties are read on the thread that TRIGGERS the
    // action, and pooled threads inherit properties only at creation — so
    // the group is set inside the task on a dedicated single-use thread
    // (caller-thread setJobGroup + global pool can cancel nothing, or
    // wrongly cancel a later query that reuses the pooled thread).
    val exec = java.util.concurrent.Executors.newSingleThreadExecutor()
    val ec = scala.concurrent.ExecutionContext.fromExecutorService(exec)
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      val fut = scala.concurrent.Future {
        sc.setJobGroup(gid, s"graft query (timeout ${timeoutSec}s)", interruptOnCancel = true)
        try {
          // closes the race where the timeout fires before this thread
          // even set the group (cancelJobGroup would have been a no-op
          // and the job would run unbounded)
          if (cancelled.get()) throw new InterruptedException("cancelled before start")
          df.collect()
        } finally sc.clearJobGroup()
      }(ec)
      Right(scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration(timeoutSec, "s")))
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        cancelled.set(true)
        sc.cancelJobGroup(gid)
        exec.shutdownNow() // interrupt the worker if it never reached collect
        Left(s"query exceeded ${timeoutSec}s and was cancelled")
    } finally exec.shutdown()
  }

  /** Q7 phrase matching (type_query_mappings.json: Title→match_phrase):
    * tokens must appear adjacently (any non-alnum glue between them).
    */
  def phraseMatch(c: Column, phrase: String): Column = {
    val toks = phrase.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val rx = toks.map(java.util.regex.Pattern.quote).mkString("(^|[^a-z0-9])", "[^a-z0-9]+", "($|[^a-z0-9])")
    lower(c).rlike(rx)
  }

  /** Q9 source projection: the compiler's include/exclude select-list
    * (elasticsearch_compiler_options.json:5-26) — column pruning that
    * Catalyst then pushes into the scan.
    */
  def project(df: DataFrame, include: Seq[String], exclude: Seq[String]): DataFrame = {
    val cols = (if (include.nonEmpty) df.columns.filter(include.contains)
                else df.columns).filterNot(exclude.contains)
    df.select(cols.map(col).toIndexedSeq: _*)
  }

  /** Q9 highlight: matched-fragment extraction around a term. */
  def highlight(textCol: Column, term: String, context: Int = 30): Column =
    regexp_extract(textCol,
      s"(?i)(.{0,$context}${java.util.regex.Pattern.quote(term)}.{0,$context})", 1)

  /** O1/Q6 BM25 free-text relevance — the reference's actual scoring
    * function (ES 5 default similarity; the weighted-match scorer in
    * [[search]] was the documented deviation, closed round 3):
    *
    *   score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
    *   idf(t)     = ln( (N − df + 0.5)/(df + 0.5) + 1 )      (BM25+, ES form)
    *
    * Fully in-plan, no driver actions: corpus stats (N, avgdl) are a
    * 1-row aggregate cross-joined in; per-term document frequencies
    * are a ≤|q|-row broadcast. Scale shape: the only corpus-wide
    * shuffle is the (doc, term) tf groupBy, keyed by id — everything
    * else is broadcast. Scores are emitted rounded (4 decimals) so
    * cross-engine float comparison is stable.
    */
  def bm25(docs: DataFrame, docIdCol: String, textCol: String, query: String,
           k1: Double = 1.2, b: Double = 0.75, limit: Int = 50): DataFrame = {
    val qTokens = "[a-z0-9]+".r
      .findAllIn(query.toLowerCase(java.util.Locale.ROOT)).toSeq.distinct
    val toks = docs.select(col(docIdCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("tok"))
      .filter(col("tok").isin(qTokens: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfs = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfNorm = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfs), "tok")
      .crossJoin(broadcast(stats))
      .join(lens, "doc_id")
      .withColumn("s", idf * tfNorm)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 4).as("score"), count(lit(1)).as("matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }

  /** [[bm25]] over a DYNAMIC weighted term table instead of a literal
    * query string — the scoring core pseudo-relevance feedback needs
    * (the expansion terms are data-derived, so the tf filter is a
    * broadcast equi-join on `terms(tok, w)` rather than an `isin`
    * literal; per-term score contributions are scaled by `w`).
    * Identical math, identical determinism discipline (scores rounded
    * to 4 decimals), identical scale shape: the only corpus-wide
    * shuffle is the (doc, term) tf groupBy.
    */
  def bm25Weighted(docs: DataFrame, docIdCol: String, textCol: String,
                   terms: DataFrame, k1: Double = 1.2, b: Double = 0.75,
                   limit: Int = 50): DataFrame = {
    val toks = docs.select(col(docIdCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("tok"))
      .join(broadcast(terms.select(col("tok"))), "tok")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfs = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfNorm = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(terms), "tok")
      .join(broadcast(dfs), "tok")
      .crossJoin(broadcast(stats))
      .join(lens, "doc_id")
      .withColumn("s", col("w") * idf * tfNorm)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 4).as("score"), count(lit(1)).as("matched"),
        sum(when(col("w") === 1.0, 1L).otherwise(0L)).as("matched_orig"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }

  /** BM25F (Robertson & Zaragoza 2009 §"The Probabilistic Relevance
    * Framework", eq. 3.20; originally Zaragoza et al., TREC-13 2004):
    * the FIELD-WEIGHTED extension of [[bm25]] — per-field term
    * frequencies are length-normalized PER FIELD, combined with field
    * weights into one pseudo-frequency, and saturated ONCE:
    *
    *   tf̃(t,d) = Σ_f w_f · tf_f(t,d) / (1 − b_f + b_f·len_f(d)/avglen_f)
    *   score   = Σ_t idf(t) · tf̃ / (k1 + tf̃)
    *
    * (Weighting then saturating — rather than summing per-field BM25
    * scores — is the published result: it keeps a term's marginal
    * contribution sub-linear across fields.) Fields here are positional
    * — the first `headLen` tokens form the "head" field (title-weight
    * w=2, gentle b=0.5), the remainder the "body" (w=1, b=0.75) — so
    * the oracle can re-derive the exact same split from raw text.
    *
    * Determinism: per-field tf/length are exact integers; avglen is an
    * exact-integer sum ÷ count; each tf̃ is a fixed two-term IEEE chain
    * (constants 0.5/0.25/0.75/2.0 are exact binary; k1 written as the
    * same literal both engines); scores rounded to 4 decimals before
    * the cross-engine compare, the [[bm25]] convention.
    *
    * Scale shape: identical to [[bm25]] — the only corpus-wide shuffle
    * is the (doc, term) tf groupBy; df and corpus stats broadcast.
    */
  def bm25f(docs: DataFrame, docIdCol: String, textCol: String,
            query: String, headLen: Int = 10, wHead: Double = 2.0,
            k1: Double = 1.2, limit: Int = 50): DataFrame = {
    val qTokens = "[a-z0-9]+".r
      .findAllIn(query.toLowerCase(java.util.Locale.ROOT)).toSeq.distinct
    val toks = docs.select(col(docIdCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val lens = toks.select(col("doc_id"),
      least(size(col("t")), lit(headLen)).cast("double").as("lh"),
      greatest(size(col("t")) - headLen, lit(0)).cast("double").as("lb"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n"),
      avg(col("lh")).as("avg_lh"), avg(col("lb")).as("avg_lb"))
    val tf = toks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(qTokens: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(sum(when(col("pos") < headLen, 1L).otherwise(0L)).as("tfh"),
        sum(when(col("pos") >= headLen, 1L).otherwise(0L)).as("tfb"))
    val dfs = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    // two-term pseudo-frequency; the body term is gated on avg_lb > 0
    // (an all-short corpus has tfb = 0 everywhere, but 0/NaN ≠ 0)
    val tfTilde =
      lit(wHead) * col("tfh").cast("double") /
        (lit(0.5) + lit(0.5) * col("lh") / col("avg_lh")) +
      when(col("avg_lb") > 0.0,
        col("tfb").cast("double") /
          (lit(0.25) + lit(0.75) * col("lb") / col("avg_lb")))
        .otherwise(lit(0.0))
    tf.join(broadcast(dfs), "tok")
      .crossJoin(broadcast(stats))
      .join(lens, "doc_id")
      .withColumn("s", idf * tfTilde / (lit(k1) + tfTilde))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 4).as("score"), count(lit(1)).as("matched"),
        sum(col("tfh")).as("tf_head"), sum(col("tfb")).as("tf_body"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    * 2001, "A Study of Smoothing Methods for Language Models Applied
    * to Ad Hoc Information Retrieval" — the sparse "efficient"
    * decomposition Lucene ships as LMDirichletSimilarity): the other
    * canonical probabilistic ranking function next to [[bm25]],
    *
    *   score(q,d) = Σ_{t ∈ q∩d} ln(1 + tf_{t,d}·|C| / (μ·cf_t))
    *              + |q|·ln(μ / (dl_d + μ)),
    *
    * where cf_t is the COLLECTION frequency (total occurrences, not
    * document count — the LM/BM25 statistical split) and |C| the total
    * corpus token count. Only documents matching ≥1 query term are
    * ranked — the inverted-index contract; unmatched documents carry a
    * rank-only length prior that no index would materialize.
    *
    * Determinism: the matched-term sum is a ≤|q|-row double sum →
    * total score rounded to 4 decimals (the [[bm25]] convention);
    * (score DESC, doc_id) total order. cf/|C| are exact integers cast
    * once; μ is the same literal on both engines.
    *
    * Scale shape ≡ [[bm25]]: the only corpus-wide shuffle is the
    * (doc, term) tf groupBy; cf (≤|q| rows) and |C| (1 row) broadcast;
    * final order is a top-k (TakeOrderedAndProject), never a global
    * sort.
    */
  def qld(docs: DataFrame, docIdCol: String, textCol: String,
          query: String, mu: Double = 300.0, limit: Int = 50): DataFrame = {
    val qTokens = "[a-z0-9]+".r
      .findAllIn(query.toLowerCase(java.util.Locale.ROOT)).toSeq.distinct
    val toks = docs.select(col(docIdCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).cast("double").as("dl"))
    val ex = toks.select(col("doc_id"), explode(col("t")).as("tok"))
    val stats = ex.agg(count(lit(1)).cast("double").as("ctot"))
    val cfs = ex.filter(col("tok").isin(qTokens: _*))
      .groupBy(col("tok")).agg(count(lit(1)).cast("double").as("cf"))
    val tf = ex.filter(col("tok").isin(qTokens: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    tf.join(broadcast(cfs), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("s", log(lit(1.0) + col("tf") * col("ctot") / (lit(mu) * col("cf"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("sm"), count(lit(1)).as("matched"))
      .join(lens, "doc_id")
      .withColumn("score",
        round(col("sm") + lit(qTokens.size.toDouble) * log(lit(mu) / (col("dl") + lit(mu))), 4))
      .select(col("doc_id"), col("score"), col("matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }
}
