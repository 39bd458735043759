package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Generation-eval + uncertainty metrics for an LLM data/eval plane
  * (beyond-reference; the reference's KG scope has no generation
  * eval): ROUGE-1/2 between paired documents, chrF (character
  * n-gram F-score, Popović 2015), and split conformal prediction
  * intervals (Vovk et al.; Angelopoulos & Bates 2021 tutorial form).
  *
  * Pairing convention for the text metrics: the synthetic corpus has
  * contiguous doc_ids, so each even doc_id is the "reference" and
  * doc_id+1 its "hypothesis" — the operators apply unchanged to any
  * (ref_text, hyp_text) pair table.
  *
  * Determinism: every metric is integer n-gram counting followed by a
  * short fixed-order IEEE chain (one division per ratio, the F
  * combination written with identical associativity in both engines).
  * No transcendental is evaluated anywhere — this is why ROUGE/chrF
  * are certifiable where BLEU's exp() brevity penalty would not be.
  *
  * Scale: n-gram counting is explode → hash-aggregate on
  * (pair, n, gram) — map-side combinable, no window, no join (the
  * ref/hyp sides meet in ONE aggregation via conditional sums, never
  * an outer join). Conformal is three hash aggregations and one
  * keyed (per-group) window for the calibration-rank selection.
  */
object LlmEval {

  /** 0 if b is 0 else a/b as double — one division, both engines. */
  private def ratio(a: Column, b: Column): Column =
    when(b > 0, a.cast("double") / b.cast("double")).otherwise(lit(0.0))

  /** Per-pair, per-order token-n-gram totals (pair_id, n, tr, th, ov)
    * for the token metrics (BLEU/ROUGE) — r12 shape: pivot the two
    * token arrays of a pair together and compute every order's
    * (tr, th, ov) in one native kernel call — the explode shape
    * shuffled and hash-aggregated one row PER GRAM (eval_bleu: 18 MB /
    * ~2M gram rows at sf0.1). Semantics preserved exactly:
    *  - a (pair, n) row both of whose sides lack order-n grams was
    *    ABSENT before and hit the callers' coalesce defaults; the
    *    kernel's tr = th = ov = 0 row produces the same final values
    *    (bleu: (0+1)/(0+1) = 1 ≡ the absent-row default 1.0; rouge:
    *    ratio guards give 0.0 ≡ its default), so callers keep their
    *    coalesce picks unchanged;
    *  - a pair with NO tokens on either side produced no rows at all
    *    (absent from output) — reproduced by the size filter.
    */
  private def pairNgramTotals(docs: DataFrame, maxN: Int): DataFrame =
    docs
      .select((col("doc_id") - (col("doc_id") % 2)).as("pair_id"),
        (col("doc_id") % 2).as("side"), col("src"))
      .groupBy(col("pair_id"))
      .agg(
        coalesce(max(when(col("side") === 0, col("src"))),
          array().cast("array<string>")).as("ref"),
        coalesce(max(when(col("side") === 1, col("src"))),
          array().cast("array<string>")).as("hyp"))
      .filter(size(col("ref")) + size(col("hyp")) > 0)
      .select(col("pair_id"), explode(
        graft.plans.NativeExpressions.ngramPairTotals(
          col("ref"), col("hyp"), maxN)).as("t"))
      .select(col("pair_id"), col("t.n").as("n"), col("t.tr").as("tr"),
        col("t.th").as("th"), col("t.ov").as("ov"))

  /** ROUGE-1 and ROUGE-2 precision/recall/F1 per (even, odd) document
    * pair. Clipped-overlap definition (Lin 2004): ov = Σ_g min(count
    * in ref, count in hyp); P = ov/|hyp grams|, R = ov/|ref grams|,
    * F = 2PR/(P+R). Pairs where an order has no grams (1-token doc →
    * no bigrams) score 0 for that order.
    */
  def rouge(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("src"))
    val per = pairNgramTotals(docs, 2)
      .withColumn("p", ratio(col("ov"), col("th")))
      .withColumn("r", ratio(col("ov"), col("tr")))
      .withColumn("f", when(col("p") + col("r") > 0,
        lit(2.0) * col("p") * col("r") / (col("p") + col("r")))
        .otherwise(lit(0.0)))
    def pick(n: Int, c: String): Column =
      coalesce(max(when(col("n") === n, col(c))), lit(0.0))
    per.groupBy(col("pair_id"))
      .agg(pick(1, "p").as("rouge1_p"), pick(1, "r").as("rouge1_r"),
        pick(1, "f").as("rouge1_f"), pick(2, "p").as("rouge2_p"),
        pick(2, "r").as("rouge2_r"), pick(2, "f").as("rouge2_f"))
      .orderBy(col("pair_id"))
  }

  val rougeSql: String =
    """WITH toks AS (SELECT doc_id,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      |g AS (
      |  SELECT doc_id, 1 AS n, unnest(t) AS gram FROM toks
      |  UNION ALL
      |  SELECT doc_id, 2 AS n, unnest(list_transform(
      |      range(greatest(len(t) - 1, 0)), i -> t[i+1] || ' ' || t[i+2])) AS gram
      |  FROM toks),
      |c AS (SELECT doc_id - (doc_id % 2) AS pair_id, n, gram,
      |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr,
      |    CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ch
      |  FROM g GROUP BY 1, 2, 3),
      |a AS (SELECT pair_id, n, CAST(SUM(cr) AS BIGINT) AS tr,
      |    CAST(SUM(ch) AS BIGINT) AS th,
      |    CAST(SUM(least(cr, ch)) AS BIGINT) AS ov
      |  FROM c GROUP BY 1, 2),
      |m AS (SELECT pair_id, n,
      |    CASE WHEN th > 0 THEN CAST(ov AS DOUBLE) / CAST(th AS DOUBLE)
      |      ELSE 0.0e0 END AS p,
      |    CASE WHEN tr > 0 THEN CAST(ov AS DOUBLE) / CAST(tr AS DOUBLE)
      |      ELSE 0.0e0 END AS r
      |  FROM a),
      |f AS (SELECT pair_id, n, p, r,
      |    CASE WHEN p + r > 0 THEN 2.0e0 * p * r / (p + r)
      |      ELSE 0.0e0 END AS f
      |  FROM m)
      |SELECT pair_id,
      |  coalesce(MAX(CASE WHEN n = 1 THEN p END), 0.0e0) AS rouge1_p,
      |  coalesce(MAX(CASE WHEN n = 1 THEN r END), 0.0e0) AS rouge1_r,
      |  coalesce(MAX(CASE WHEN n = 1 THEN f END), 0.0e0) AS rouge1_f,
      |  coalesce(MAX(CASE WHEN n = 2 THEN p END), 0.0e0) AS rouge2_p,
      |  coalesce(MAX(CASE WHEN n = 2 THEN r END), 0.0e0) AS rouge2_r,
      |  coalesce(MAX(CASE WHEN n = 2 THEN f END), 0.0e0) AS rouge2_f
      |FROM f GROUP BY pair_id ORDER BY pair_id""".stripMargin

  /** chrF per document pair: character 1/2/3-gram F-scores with the
    * standard β = 2 recall weighting, F_n = 5PR/(4P+R), and their
    * mean chrf = (F1+F2+F3)/3. Space/punctuation are stripped first
    * (Popović 2015 §2).
    */
  def chrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9]", "").as("src"))
    // r12: the explode → hash-aggregate shape generated ~1.5M gram
    // strings per execution (profiled 4.6 s of the 3.9 s query). The
    // two docs of a pair are pivoted together instead and the per-order
    // totals come from the native clipped-overlap kernel — identical
    // integers, so p/r/f are the same IEEE chain. A pair whose BOTH
    // cleaned sides are empty produced no exploded rows (and no output
    // row) before, hence the filter; a missing order (doc shorter than
    // n) had no (pair, n) row and scored 0 via the pick() default —
    // the kernel's tr = th = 0 row yields the same 0.0.
    val per = docs
      .select((col("doc_id") - (col("doc_id") % 2)).as("pair_id"),
        (col("doc_id") % 2).as("side"), col("src"))
      .groupBy(col("pair_id"))
      .agg(coalesce(max(when(col("side") === 0, col("src"))), lit("")).as("ref"),
        coalesce(max(when(col("side") === 1, col("src"))), lit("")).as("hyp"))
      .filter(length(col("ref")) + length(col("hyp")) > 0)
      .select(col("pair_id"), explode(
        graft.plans.NativeExpressions.chrfPairTotals(col("ref"), col("hyp")))
        .as("t"))
      .select(col("pair_id"), col("t.n").as("n"), col("t.tr").as("tr"),
        col("t.th").as("th"), col("t.ov").as("ov"))
      .withColumn("p", ratio(col("ov"), col("th")))
      .withColumn("r", ratio(col("ov"), col("tr")))
      .withColumn("f", when(col("p") + col("r") > 0,
        lit(5.0) * col("p") * col("r") / (lit(4.0) * col("p") + col("r")))
        .otherwise(lit(0.0)))
    def pick(n: Int): Column =
      coalesce(max(when(col("n") === n, col("f"))), lit(0.0))
    per.groupBy(col("pair_id"))
      .agg(pick(1).as("chrf1"), pick(2).as("chrf2"), pick(3).as("chrf3"))
      .withColumn("chrf",
        (col("chrf1") + col("chrf2") + col("chrf3")) / lit(3.0))
      .orderBy(col("pair_id"))
  }

  val chrfSql: String =
    """WITH src AS (SELECT doc_id,
      |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS cs FROM documents),
      |g AS (
      |  SELECT doc_id, 1 AS n, unnest(list_transform(
      |      range(greatest(len(cs), 0)), i -> substr(cs, i + 1, 1))) AS gram FROM src
      |  UNION ALL
      |  SELECT doc_id, 2 AS n, unnest(list_transform(
      |      range(greatest(len(cs) - 1, 0)), i -> substr(cs, i + 1, 2))) AS gram FROM src
      |  UNION ALL
      |  SELECT doc_id, 3 AS n, unnest(list_transform(
      |      range(greatest(len(cs) - 2, 0)), i -> substr(cs, i + 1, 3))) AS gram FROM src),
      |c AS (SELECT doc_id - (doc_id % 2) AS pair_id, n, gram,
      |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr,
      |    CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ch
      |  FROM g GROUP BY 1, 2, 3),
      |a AS (SELECT pair_id, n, CAST(SUM(cr) AS BIGINT) AS tr,
      |    CAST(SUM(ch) AS BIGINT) AS th,
      |    CAST(SUM(least(cr, ch)) AS BIGINT) AS ov
      |  FROM c GROUP BY 1, 2),
      |m AS (SELECT pair_id, n,
      |    CASE WHEN th > 0 THEN CAST(ov AS DOUBLE) / CAST(th AS DOUBLE)
      |      ELSE 0.0e0 END AS p,
      |    CASE WHEN tr > 0 THEN CAST(ov AS DOUBLE) / CAST(tr AS DOUBLE)
      |      ELSE 0.0e0 END AS r
      |  FROM a),
      |f AS (SELECT pair_id, n, CASE WHEN p + r > 0
      |    THEN 5.0e0 * p * r / (4.0e0 * p + r) ELSE 0.0e0 END AS f
      |  FROM m),
      |w AS (SELECT pair_id,
      |    coalesce(MAX(CASE WHEN n = 1 THEN f END), 0.0e0) AS chrf1,
      |    coalesce(MAX(CASE WHEN n = 2 THEN f END), 0.0e0) AS chrf2,
      |    coalesce(MAX(CASE WHEN n = 3 THEN f END), 0.0e0) AS chrf3
      |  FROM f GROUP BY pair_id)
      |SELECT pair_id, chrf1, chrf2, chrf3,
      |  (chrf1 + chrf2 + chrf3) / 3.0e0 AS chrf
      |FROM w ORDER BY pair_id""".stripMargin

  /** Split conformal prediction intervals per event_type at α = 0.1:
    * a deterministic salted-hash 60/20/20 train/calibration/test
    * split, the predictor is the train-split mean (decimal-exact sum,
    * ONE cast to double), nonconformity = |value − mean|, and q̂ is
    * the ⌈0.9(n_cal+1)⌉-th smallest calibration score — an exact rank
    * SELECTION, so the emitted q̂ is an untouched |residual| value.
    * Marginal coverage on the held-out test split is reported beside
    * the interval; the finite-sample guarantee coverage ≥ 1 − α for
    * exchangeable data holds only where k = ⌈0.9(n_cal+1)⌉ ≤ n_cal,
    * i.e. n_cal ≥ 9. Smaller calibration groups emit the standard
    * split-conformal INFINITE interval as NULL q̂/lo/hi (never a
    * silently under-covering capped bound) — every test point is
    * covered by the infinite interval, so `coverage` is 1 there by
    * construction and stays the honest measurement of the emitted
    * interval.
    *
    * Scale: one narrow hashed-split map, two hash aggregations, one
    * per-group keyed window for the rank selection — no global sort.
    */
  def conformal(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"),
        pmod(conv(substr(md5(concat(lit("cf:"),
          col("event_id").cast("string"))), lit(1), lit(8)), 16, 10)
          .cast("long"), lit(10L)).as("b"))
    val mean = ev.filter(col("b") <= 5)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_train"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_pred"))
    val cal = ev.filter(col("b") === 6 || col("b") === 7)
      .join(mean, "event_type")
      .withColumn("score", abs(col("value") - col("mean_pred")))
    val calN = cal.groupBy(col("event_type")).agg(count(lit(1)).as("n_cal"))
      .withColumn("k", expr("(9 * (n_cal + 1) + 9) div 10"))
    val qhat = cal
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("score"), col("event_id"))))
      .join(calN, "event_type")
      // k > n_cal (tiny calibration split) → no finite q̂: emit NULL
      // (the standard split-conformal infinite interval), keeping the
      // group's row so n_cal/n_test still report.
      .filter(col("rn") === least(col("k"), col("n_cal")))
      .select(col("event_type"), col("n_cal"),
        when(col("k") <= col("n_cal"), col("score")).as("qhat"))
    val test = ev.filter(col("b") >= 8)
      .join(mean, "event_type").join(qhat, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test"),
        // NULL q̂ = infinite interval: every test point is covered
        sum(when(col("qhat").isNull ||
            abs(col("value") - col("mean_pred")) <= col("qhat"), 1L)
          .otherwise(0L)).as("n_covered"))
    mean.join(qhat, "event_type").join(test, "event_type")
      .select(col("event_type"), col("n_train"), col("n_cal"), col("n_test"),
        col("mean_pred"), col("qhat"),
        (col("mean_pred") - col("qhat")).as("lo"),
        (col("mean_pred") + col("qhat")).as("hi"),
        col("n_covered"),
        ratio(col("n_covered"), col("n_test")).as("coverage"))
      .orderBy(col("event_type"))
  }

  val conformalSql: String =
    """WITH ev AS (SELECT event_id, event_type, value,
      |    CAST(CAST(concat('0x', substr(md5('cf:' || CAST(event_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 10 AS BIGINT) AS b
      |  FROM events WHERE value IS NOT NULL),
      |mean AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE) AS mean_pred
      |  FROM ev WHERE b <= 5 GROUP BY 1),
      |cal AS (SELECT e.event_type, e.event_id,
      |    abs(e.value - m.mean_pred) AS score
      |  FROM ev e JOIN mean m USING (event_type) WHERE b = 6 OR b = 7),
      |caln AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
      |    (9 * (CAST(COUNT(*) AS BIGINT) + 1) + 9) // 10 AS k
      |  FROM cal GROUP BY 1),
      |rk AS (SELECT event_type, score, ROW_NUMBER() OVER (
      |    PARTITION BY event_type ORDER BY score, event_id) AS rn FROM cal),
      |qh AS (SELECT r.event_type, c.n_cal,
      |    CASE WHEN c.k <= c.n_cal THEN r.score END AS qhat
      |  FROM rk r JOIN caln c USING (event_type)
      |  WHERE r.rn = least(c.k, c.n_cal)),
      |tst AS (SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_test,
      |    CAST(SUM(CASE WHEN q.qhat IS NULL
      |      OR abs(e.value - m.mean_pred) <= q.qhat
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      |  FROM ev e JOIN mean m USING (event_type) JOIN qh q USING (event_type)
      |  WHERE e.b >= 8 GROUP BY 1)
      |SELECT m.event_type, m.n_train, q.n_cal, t.n_test, m.mean_pred,
      |  q.qhat, m.mean_pred - q.qhat AS lo, m.mean_pred + q.qhat AS hi,
      |  t.n_covered,
      |  CASE WHEN t.n_test > 0 THEN CAST(t.n_covered AS DOUBLE)
      |    / CAST(t.n_test AS DOUBLE) ELSE 0.0e0 END AS coverage
      |FROM mean m JOIN qh q USING (event_type) JOIN tst t USING (event_type)
      |ORDER BY m.event_type""".stripMargin

  /** BLEU-4 modified n-gram precisions per document pair (Papineni
    * 2002), add-one smoothed (p_n = (ov_n+1)/(th_n+1), the Lin & Och
    * 2004 convention so short hypotheses never zero the geometric
    * mean), combined as the 4th root — ²√²√(p1·p2·p3·p4), two
    * correctly-rounded IEEE sqrts, which is why this is certifiable
    * where exp(Σlog/4) would not be. The brevity penalty's
    * exp(1−r/c) IS transcendental, so it is not folded in: the
    * len_ratio column (c/r) carries the information and bleu_nobp
    * is exact. Same one-aggregation plan as ROUGE — the ref/hyp
    * sides meet in one conditional-sum aggregation, no join.
    */
  def bleu(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("src"))
    val per = pairNgramTotals(docs, 4)
      .withColumn("p", (col("ov") + 1L).cast("double") /
        (col("th") + 1L).cast("double"))
    // a (pair, n) row is ABSENT when neither side has any n-gram (both
    // docs shorter than n tokens) — under the add-one convention that
    // is p_n = (0+1)/(0+1) = 1, not 0, else a short pair would zero
    // the geometric mean the smoothing exists to protect
    def pick(n: Int, c: String): Column =
      coalesce(max(when(col("n") === n, col(c))), lit(1.0))
    per.groupBy(col("pair_id"))
      .agg(pick(1, "p").as("p1"), pick(2, "p").as("p2"),
        pick(3, "p").as("p3"), pick(4, "p").as("p4"),
        coalesce(max(when(col("n") === 1, col("th"))), lit(0L)).as("hyp_len"),
        coalesce(max(when(col("n") === 1, col("tr"))), lit(0L)).as("ref_len"))
      .withColumn("len_ratio", ratio(col("hyp_len"), col("ref_len")))
      .withColumn("bleu_nobp",
        sqrt(sqrt(col("p1") * col("p2") * col("p3") * col("p4"))))
      .orderBy(col("pair_id"))
  }

  val bleuSql: String =
    """WITH toks AS (SELECT doc_id,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      |g AS (
      |  SELECT doc_id, 1 AS n, unnest(t) AS gram FROM toks
      |  UNION ALL
      |  SELECT doc_id, 2 AS n, unnest(list_transform(
      |      range(greatest(len(t) - 1, 0)), i -> t[i+1] || ' ' || t[i+2])) AS gram
      |  FROM toks
      |  UNION ALL
      |  SELECT doc_id, 3 AS n, unnest(list_transform(
      |      range(greatest(len(t) - 2, 0)),
      |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS gram
      |  FROM toks
      |  UNION ALL
      |  SELECT doc_id, 4 AS n, unnest(list_transform(
      |      range(greatest(len(t) - 3, 0)),
      |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
      |  FROM toks),
      |c AS (SELECT doc_id - (doc_id % 2) AS pair_id, n, gram,
      |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr,
      |    CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ch
      |  FROM g GROUP BY 1, 2, 3),
      |a AS (SELECT pair_id, n, CAST(SUM(cr) AS BIGINT) AS tr,
      |    CAST(SUM(ch) AS BIGINT) AS th,
      |    CAST(SUM(least(cr, ch)) AS BIGINT) AS ov
      |  FROM c GROUP BY 1, 2),
      |m AS (SELECT pair_id, n, tr, th,
      |    CAST(ov + 1 AS DOUBLE) / CAST(th + 1 AS DOUBLE) AS p
      |  FROM a),
      |w AS (SELECT pair_id,
      |    coalesce(MAX(CASE WHEN n = 1 THEN p END), 1.0e0) AS p1,
      |    coalesce(MAX(CASE WHEN n = 2 THEN p END), 1.0e0) AS p2,
      |    coalesce(MAX(CASE WHEN n = 3 THEN p END), 1.0e0) AS p3,
      |    coalesce(MAX(CASE WHEN n = 4 THEN p END), 1.0e0) AS p4,
      |    coalesce(MAX(CASE WHEN n = 1 THEN th END), 0) AS hyp_len,
      |    coalesce(MAX(CASE WHEN n = 1 THEN tr END), 0) AS ref_len
      |  FROM m GROUP BY pair_id)
      |SELECT pair_id, p1, p2, p3, p4, hyp_len, ref_len,
      |  CASE WHEN ref_len > 0 THEN CAST(hyp_len AS DOUBLE)
      |    / CAST(ref_len AS DOUBLE) ELSE 0.0e0 END AS len_ratio,
      |  sqrt(sqrt(p1 * p2 * p3 * p4)) AS bleu_nobp
      |FROM w ORDER BY pair_id""".stripMargin

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    * Models Trained on Code", §2.1): THE coding-eval metric — given n
    * sampled attempts per problem of which c succeed, the unbiased
    * estimator of the probability that at least one of k draws
    * succeeds is
    *
    *   pass@k = 1 − C(n−c, k)/C(n, k)
    *          = 1 − Π_{i=0}^{k−1} (n−c−i)/(n−i),
    *
    * evaluated in the paper's numerically-stable product form (never
    * the raw binomials). Deterministic surrogate attempt log: each
    * part is a "problem", its order lines the attempts, success =
    * quantity ≥ 45 (≈12% base rate) — a fixed predicate that
    * exercises exactly the estimator's dataflow. Report per problem
    * (n ≥ 20 so k ≤ 10 ≤ n everywhere): n, c, pass@1/5/10, top-k by
    * pass@10. When n−c < k some factor hits zero and the product
    * collapses to 0 → pass@k = 1, the estimator's own convention.
    *
    * Determinism: n, c exact integers; each pass@k one fixed-length
    * left-to-right product fold of exact-rational factors (Spark
    * `aggregate` over `sequence` ≡ DuckDB list_reduce over range,
    * init 1.0, acc·((n−c−i)/(n−i)) with the division grouped first
    * in both engines); (pass@10 DESC, problem) total order.
    *
    * Scale shape: one keyed count/sum aggregation over the attempts
    * table (map-side combine), constant-length row-local folds,
    * TakeOrderedAndProject top-k.
    */
  def evalPassK(s: SparkSession, dir: String, minN: Int = 20,
                k: Int = 50): DataFrame = {
    val at = Tables(s, dir, "lineitem")
      .select(col("l_partkey").as("problem"),
        (col("l_quantity") >= 45.0).cast("long").as("ok"))
    val g = at.groupBy(col("problem"))
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("c"))
      .filter(col("n") >= minN)
    def passAt(kk: Int): Column = {
      val nn = col("n").cast("double")
      val cc = col("c").cast("double")
      lit(1.0) - aggregate(sequence(lit(0), lit(kk - 1)), lit(1.0),
        (acc, i) => acc *
          ((nn - cc - i.cast("double")) / (nn - i.cast("double"))))
    }
    g.select(col("problem"), col("n"), col("c"),
        passAt(1).as("pass1"), passAt(5).as("pass5"),
        passAt(10).as("pass10"))
      .orderBy(col("pass10").desc, col("problem"))
      .limit(k)
  }

  val evalPassKSql: String = {
    def passS(kk: Int): String =
      s"1.0e0 - list_reduce(list_prepend(1.0e0, " +
        s"list_transform(range(0, $kk), i -> CAST(i AS DOUBLE))), " +
        s"(acc, x) -> acc * ((CAST(n AS DOUBLE) - CAST(c AS DOUBLE) - x) " +
        s"/ (CAST(n AS DOUBLE) - x)))"
    s"""WITH a AS (SELECT l_partkey AS problem,
       |    CASE WHEN l_quantity >= 45.0 THEN 1 ELSE 0 END AS ok
       |  FROM lineitem),
       |g AS (SELECT problem, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(ok) AS BIGINT) AS c
       |  FROM a GROUP BY problem HAVING COUNT(*) >= 20)
       |SELECT problem, n, c, ${passS(1)} AS pass1, ${passS(5)} AS pass5,
       |  ${passS(10)} AS pass10
       |FROM g ORDER BY pass10 DESC, problem LIMIT 50""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_rouge" -> (rouge _),
    "eval_chrf" -> (chrf _),
    "eval_conformal" -> (conformal _),
    "eval_passk" -> ((s: SparkSession, dir: String) => evalPassK(s, dir)),
    "eval_bleu" -> (bleu _))

  val oracles: Map[String, String] = Map(
    "eval_rouge" -> rougeSql,
    "eval_chrf" -> chrfSql,
    "eval_conformal" -> conformalSql,
    "eval_passk" -> evalPassKSql,
    "eval_bleu" -> bleuSql)
}
