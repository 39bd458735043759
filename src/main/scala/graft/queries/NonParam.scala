package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 nonparametric / resampling inference: McNemar's paired
  * test, the two-sample Cramér–von Mises criterion, and an
  * approximate-randomization permutation test — the three standard
  * "no distributional assumptions" tools missing from the
  * rank/contingency battery (Mann-Whitney, KS, chi-square, Fisher).
  *
  * Determinism: McNemar is pure integer contingency counting + one
  * fixed ratio chain; CvM is computed from exact integer ECDF
  * cross-terms (never per-row double summation); the permutation
  * test derives every resample from salted md5 — the stats_bootstrap
  * convention — so both engines draw the identical 200 pseudo-random
  * reassignments.
  */
object NonParam {

  private def dsum(c: Column, out: String): Column =
    sum(c.cast("decimal(38,0)")).cast("double").as(out)

  /** McNemar's test for paired binary outcomes (McNemar 1947): the
    * pair is a (user, day), the two paired conditions are morning
    * (hour < 12) and afternoon — "did this user click in the AM vs
    * in the PM of the same day?", the within-subject shape a plain
    * two-sample proportion test gets wrong. Discordant counts b
    * (AM-only) and c (PM-only) give the statistic (b−c)²/(b+c) and
    * the continuity-corrected (|b−c|−1)²/(b+c); the concordant cells
    * never enter — the insight of the test. Two hash aggregations,
    * integer until the final two divisions.
    */
  def mcnemar(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "events")
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(max(when(hour(col("ts")) < 12 && col("event_type") === "click", 1L)
        .otherwise(0L)).as("ex"),
        max(when(hour(col("ts")) >= 12 && col("event_type") === "click", 1L)
          .otherwise(0L)).as("ey"))
    per.agg(count(lit(1)).as("n"),
        sum(col("ex") * col("ey")).as("n11"),
        sum(col("ex") * (lit(1L) - col("ey"))).as("b"),
        sum((lit(1L) - col("ex")) * col("ey")).as("c"))
      .select(col("n"), col("n11"), col("b"), col("c"),
        when(col("b") + col("c") > 0,
          ((col("b") - col("c")) * (col("b") - col("c"))).cast("double") /
            (col("b") + col("c")).cast("double")).as("stat"),
        when(col("b") + col("c") > 0,
          ((abs(col("b") - col("c")) - 1L) * (abs(col("b") - col("c")) - 1L))
            .cast("double") /
            (col("b") + col("c")).cast("double")).as("stat_cc"))
  }

  val mcnemarSql: String =
    """WITH per AS (SELECT user_id, CAST(ts AS DATE) AS day,
      |    MAX(CASE WHEN hour(ts) < 12
      |      AND event_type = 'click' THEN 1 ELSE 0 END) AS ex,
      |    MAX(CASE WHEN hour(ts) >= 12
      |      AND event_type = 'click' THEN 1 ELSE 0 END) AS ey
      |  FROM events GROUP BY 1, 2),
      |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(ex * ey) AS BIGINT) AS n11,
      |    CAST(SUM(ex * (1 - ey)) AS BIGINT) AS b,
      |    CAST(SUM((1 - ex) * ey) AS BIGINT) AS c
      |  FROM per)
      |SELECT n, n11, b, c,
      |  CASE WHEN b + c > 0 THEN
      |    CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE) END AS stat,
      |  CASE WHEN b + c > 0 THEN
      |    CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
      |      / CAST(b + c AS DOUBLE) END AS stat_cc
      |FROM agg""".stripMargin

  /** Two-sample Cramér–von Mises criterion (Anderson 1962) between
    * click and view event values: T = Σ_z c_z·(F_n(z) − G_m(z))² ·
    * nm/(n+m)², summed over the combined distinct values with
    * multiplicity — computed entirely from exact integer ECDF counts
    * via the identity F−G = (a·m − b·n)/(n·m), so the accumulated
    * sum S = Σ c·(a·m − b·n)² is an exact integer (DECIMAL(38,0);
    * the cross-multiplication itself is decimal, exact to n·m <
    * 10^38, and S stays within 38 digits up to n,m ≈ 1e8 — past
    * that ANSI decimal overflow fails loudly, as does DuckDB's
    * HUGEINT) and T = S/(n·m·(n+m)²) is ONE double chain.
    * Tie-robust (values are grouped, never ranked per-row).
    *
    * Scale: per-distinct-value counts → the stats_ks two-level
    * cumulative (1024-bucket offsets + bucket-keyed windows) — no
    * global sort at any corpus size.
    */
  def cvm(s: SparkSession, dir: String): DataFrame = {
    val vals = Tables(s, dir, "events")
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "view"))
      .groupBy(col("value").as("v"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cx"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("cy"))
    val rng = vals.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      sum(col("cx")).as("n"), sum(col("cy")).as("m"))
    val bucketed = vals.crossJoin(broadcast(rng))
      .withColumn("bucket",
        least(floor((col("v") - col("lo")) * 1024.0 /
          greatest(col("hi") - col("lo"), lit(1e-300))).cast("long"), lit(1023L)))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("cx")).as("sx"), sum(col("cy")).as("sy"))
      .withColumn("offx", coalesce(sum(col("sx")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("offy", coalesce(sum(col("sy")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offx"), col("offy"))
    val wb = Window.partitionBy(col("bucket")).orderBy(col("v"))
    val cum = bucketed.join(broadcast(offsets), "bucket")
      .withColumn("a", col("offx") + sum(col("cx")).over(wb))
      .withColumn("b", col("offy") + sum(col("cy")).over(wb))
      // cross-multiply in DECIMAL, not Long: a·m ≤ n·m overflows Long
      // once each sample passes ~3e9 rows. decimal(19,0) operands give
      // a (38,0) product — exact for n·m < 10^38. The squared-sum S
      // below is still bounded by 38 digits (S ≤ (n+m)·n²m², exceeded
      // around n,m ≳ 1e8); past that Spark's ANSI decimal overflow
      // fails LOUDLY, matching DuckDB's HUGEINT loud overflow — never
      // a silent wrong answer.
      .withColumn("diff",
        col("a").cast("decimal(19,0)") * col("m").cast("decimal(19,0)") -
        col("b").cast("decimal(19,0)") * col("n").cast("decimal(19,0)"))
    cum.groupBy(col("n"), col("m"))
      .agg(sum((col("diff").cast("decimal(38,0)") * col("diff").cast("decimal(38,0)"))
        * (col("cx") + col("cy")).cast("decimal(38,0)")).cast("double").as("s"))
      .select(col("n"), col("m"), col("s"),
        (col("s") / (col("n").cast("double") * col("m").cast("double") *
          (col("n").cast("double") + col("m").cast("double")) *
          (col("n").cast("double") + col("m").cast("double")))).as("t"))
  }

  val cvmSql: String =
    """WITH vals AS (SELECT value AS v,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cy
      |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cx) AS BIGINT) AS n, CAST(SUM(cy) AS BIGINT) AS m
      |  FROM vals),
      |cum AS (SELECT v, cx, cy,
      |    CAST(SUM(cx) OVER (ORDER BY v) AS BIGINT) AS a,
      |    CAST(SUM(cy) OVER (ORDER BY v) AS BIGINT) AS b
      |  FROM vals),
      |terms AS (SELECT c.cx, c.cy,
      |    CAST(c.a AS HUGEINT) * t.m - CAST(c.b AS HUGEINT) * t.n AS diff,
      |    t.n, t.m
      |  FROM cum c CROSS JOIN tot t)
      |SELECT n, m,
      |  CAST(SUM(CAST(diff AS HUGEINT) * CAST(diff AS HUGEINT)
      |    * CAST(cx + cy AS HUGEINT)) AS DOUBLE) AS s,
      |  CAST(SUM(CAST(diff AS HUGEINT) * CAST(diff AS HUGEINT)
      |    * CAST(cx + cy AS HUGEINT)) AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)
      |      * (CAST(n AS DOUBLE) + CAST(m AS DOUBLE))
      |      * (CAST(n AS DOUBLE) + CAST(m AS DOUBLE))) AS t
      |FROM terms GROUP BY n, m""".stripMargin

  /** Shared two-sample ECDF table over the click/view `value`
    * distributions: per distinct value v, the pair counts (cx, cy)
    * and the exact integer cumulative counts (a, b) through v,
    * plus the totals (n, m) — the stats_cvm two-level cumulative
    * (1024-bucket offsets + bucket-keyed windows; no global sort at
    * any corpus size). [[cliffs]] and [[andersonDarling]] run off
    * this one shape.
    */
  private def pairEcdf(s: SparkSession, dir: String): DataFrame = {
    val vals = Tables(s, dir, "events")
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "view"))
      .groupBy(col("value").as("v"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cx"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("cy"))
    val rng = vals.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      sum(col("cx")).as("n"), sum(col("cy")).as("m"))
    val bucketed = vals.crossJoin(broadcast(rng))
      .withColumn("bucket",
        least(floor((col("v") - col("lo")) * 1024.0 /
          greatest(col("hi") - col("lo"), lit(1e-300))).cast("long"), lit(1023L)))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("cx")).as("sx"), sum(col("cy")).as("sy"))
      .withColumn("offx", coalesce(sum(col("sx")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("offy", coalesce(sum(col("sy")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offx"), col("offy"))
    val wb = Window.partitionBy(col("bucket")).orderBy(col("v"))
    bucketed.join(broadcast(offsets), "bucket")
      .withColumn("a", col("offx") + sum(col("cx")).over(wb))
      .withColumn("b", col("offy") + sum(col("cy")).over(wb))
  }

  private val pairEcdfSql: String =
    """vals AS (SELECT value AS v,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cy
      |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cx) AS BIGINT) AS n, CAST(SUM(cy) AS BIGINT) AS m
      |  FROM vals),
      |cum AS (SELECT v, cx, cy,
      |    CAST(SUM(cx) OVER (ORDER BY v) AS BIGINT) AS a,
      |    CAST(SUM(cy) OVER (ORDER BY v) AS BIGINT) AS b
      |  FROM vals)""".stripMargin

  /** Cliff's delta (Cliff 1993) — the standard nonparametric effect
    * size the rank battery reports next to Mann–Whitney's p-value:
    * δ = (#{x>y} − #{x<y}) / (n·m) over all click×view value pairs,
    * computed WITHOUT enumerating pairs from the exact integer ECDF:
    * #{x>y} = Σ_v cx(v)·(b(v) − cy(v)) (views strictly below v) and
    * #{x<y} = Σ_v cx(v)·(m − b(v)), ties = Σ cx·cy. All three pair
    * counts are exact DECIMAL(38,0) sums (gt ≤ n·m — Long overflows
    * past n,m ≈ 3e9, decimal is exact to 10^38); δ is ONE double
    * chain. |δ| ≥ 0.147/0.33/0.474 are Romano's small/medium/large
    * fences — emitted as a label by integer-free threshold compares.
    *
    * Scale: the [[pairEcdf]] two-level cumulative + one hash
    * aggregation — no global sort, no pair explosion, ever.
    */
  def cliffs(s: SparkSession, dir: String): DataFrame = {
    val cum = pairEcdf(s, dir)
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    cum.groupBy(col("n"), col("m"))
      .agg(sum(d38(col("cx")) * d38(col("b") - col("cy"))).cast("long").as("gt"),
        sum(d38(col("cx")) * d38(col("m") - col("b"))).cast("long").as("lt"),
        sum(d38(col("cx")) * d38(col("cy"))).cast("long").as("ties"))
      .withColumn("delta",
        (col("gt").cast("double") - col("lt").cast("double")) /
          (col("n").cast("double") * col("m").cast("double")))
      .withColumn("magnitude",
        when(abs(col("delta")) < 0.147, lit("negligible"))
          .when(abs(col("delta")) < 0.33, lit("small"))
          .when(abs(col("delta")) < 0.474, lit("medium"))
          .otherwise(lit("large")))
      .select(col("n"), col("m"), col("gt"), col("lt"), col("ties"),
        col("delta"), col("magnitude"))
  }

  val cliffsSql: String =
    s"""WITH $pairEcdfSql,
      |agg AS (SELECT t.n, t.m,
      |    CAST(SUM(CAST(c.cx AS HUGEINT) * (c.b - c.cy)) AS BIGINT) AS gt,
      |    CAST(SUM(CAST(c.cx AS HUGEINT) * (t.m - c.b)) AS BIGINT) AS lt,
      |    CAST(SUM(CAST(c.cx AS HUGEINT) * c.cy) AS BIGINT) AS ties
      |  FROM cum c CROSS JOIN tot t GROUP BY 1, 2),
      |d AS (SELECT *, (CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) AS delta FROM agg)
      |SELECT n, m, gt, lt, ties, delta,
      |  CASE WHEN abs(delta) < 0.147e0 THEN 'negligible'
      |    WHEN abs(delta) < 0.33e0 THEN 'small'
      |    WHEN abs(delta) < 0.474e0 THEN 'medium'
      |    ELSE 'large' END AS magnitude
      |FROM d""".stripMargin

  /** Two-sample Anderson–Darling criterion (Scholz & Stephens 1987,
    * the right-continuous/no-midrank A²ₖN at k = 2) between the click
    * and view value distributions — the tail-weighted complement to
    * stats_cvm (CvM weighs the ECDF gap uniformly; AD divides by
    * B(N−B), amplifying tail disagreement). With M = click cumulative
    * a, B = pooled cumulative a+b, the k = 2 identity N·M₂ − m·B =
    * −(N·M₁ − n·B) collapses the two per-sample sums to ONE:
    * A² = (1/N)·(1/n + 1/m)·Σ_{B<N} h·(N·a − n·B)² / (B·(N−B)).
    *
    * Determinism — the fixed-point fold-free trick: each per-value
    * term is num/den with num = h·(N·a − n·B)² and den = B·(N−B)
    * both exact DECIMAL(38,0); summing the term DOUBLES would be
    * order-dependent, so instead both engines sum the exact integer
    * q = (num·2²⁰) div den (integral division — Spark IntegralDivide
    * on decimals ≡ DuckDB HUGEINT //, both truncating non-negative
    * values) and divide ONCE at the end. Quantization ≤ 2⁻²⁰ per
    * distinct value is then scaled by (1/N)(1/n+1/m) ≈ 1/(N·n) — a
    * ≤1e-10 relative effect on A² at any plausible cardinality,
    * while the integer sum is order-free and therefore exact.
    * Bounds, loudly enforced: q must fit a BIGINT (num·2²⁰/den ≲
    * 9e18 — ANSI overflow past extreme separation at n,m ≳ 1e7) and
    * exact doubles need num < 2⁵³ only in the FINAL cast of the
    * already-integer sum.
    *
    * Scale: the [[pairEcdf]] two-level cumulative + one hash
    * aggregation — same shape as stats_cvm.
    */
  def andersonDarling(s: SparkSession, dir: String): DataFrame = {
    val cum = pairEcdf(s, dir)
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val terms = cum.filter(col("a") + col("b") < col("n") + col("m"))
      .withColumn("bb", d38(col("a") + col("b")))
      .withColumn("nn", d38(col("n") + col("m")))
      .withColumn("dd", col("nn") * d38(col("a")) - d38(col("n")) * col("bb"))
      .withColumn("num",
        (d38(col("cx") + col("cy")) * col("dd") * col("dd"))
          .cast("decimal(38,0)"))
      .withColumn("den", (col("bb") * (col("nn") - col("bb"))).cast("decimal(38,0)"))
      .withColumn("q", expr("(num * 1048576) div den"))
    terms.groupBy(col("n"), col("m"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("q").cast("decimal(38,0)")).cast("double").as("s_q"))
      .withColumn("a2",
        col("s_q") / lit(1048576.0) /
          (col("n").cast("double") + col("m").cast("double")) *
          (lit(1.0) / col("n").cast("double") + lit(1.0) / col("m").cast("double")))
      .select(col("n"), col("m"), col("n_terms"), col("s_q"), col("a2"))
  }

  val andersonDarlingSql: String =
    s"""WITH $pairEcdfSql,
      |terms AS (SELECT c.cx, c.cy, t.n, t.m,
      |    CAST(c.a + c.b AS HUGEINT) AS bb,
      |    CAST(t.n + t.m AS HUGEINT) AS nn,
      |    CAST(t.n + t.m AS HUGEINT) * c.a
      |      - CAST(t.n AS HUGEINT) * (c.a + c.b) AS dd
      |  FROM cum c CROSS JOIN tot t
      |  WHERE c.a + c.b < t.n + t.m),
      |qs AS (SELECT n, m,
      |    (CAST(cx + cy AS HUGEINT) * dd * dd * 1048576)
      |      // (bb * (nn - bb)) AS q
      |  FROM terms),
      |agg AS (SELECT n, m, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |    CAST(SUM(q) AS DOUBLE) AS s_q
      |  FROM qs GROUP BY 1, 2)
      |SELECT n, m, n_terms, s_q,
      |  s_q / 1048576.0e0 / (CAST(n AS DOUBLE) + CAST(m AS DOUBLE))
      |    * (1.0e0 / CAST(n AS DOUBLE) + 1.0e0 / CAST(m AS DOUBLE)) AS a2
      |FROM agg""".stripMargin

  /** Approximate-randomization permutation test (Fisher–Pitman via
    * random reassignment; Noreen 1989) for the click-vs-purchase
    * mean-value difference: 200 salted-md5 pseudo-permutations
    * reassign each observation to a side by coin flip, the observed
    * |mean difference| is compared against the resampled null, and
    * p = (1 + #{|stat_p| ≥ |obs|}) / (200 + 1) — the add-one rule
    * that keeps p valid. Values are fixed-pointed to exact micro
    * units so every per-permutation mean is a DECIMAL-exact sum with
    * one division; md5 makes the 200 reassignments bit-identical
    * across engines.
    *
    * Scale: the ×200 explode multiplies only the deterministic 1/3
    * event-id sample, and the whole test is two hash aggregations
    * (per-permutation, then global) — map-side combinable, no
    * window, no sort.
    */
  def permtest(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "events")
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "purchase") &&
        col("event_id") % 3 === 0)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 1000000.0).cast("long").as("mv"))
    val obs = base.agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_b"),
      dsum(when(col("event_type") === "click", col("mv")).otherwise(0L), "sa"),
      dsum(when(col("event_type") === "purchase", col("mv")).otherwise(0L), "sb"))
      .select(col("n_a"), col("n_b"),
        (col("sa") / col("n_a").cast("double") -
          col("sb") / col("n_b").cast("double")).as("obs"))
    // r12: the ×200 explode multiplies whatever parallelism the SAMPLE
    // scan happens to have — at sf0.1 the filtered branch sits in ONE
    // parquet split, so 20M md5 evaluations ran in a single task (4.3 s
    // measured, 31 cores idle). Spread the narrow pre-explode sample
    // round-robin across the session's full width first (guide §2.5
    // "input skew: repartition immediately after the read"): the
    // exchange moves only (event_id, mv) rows, ~1/200th of the work it
    // parallelizes, at any scale. Counts and decimal sums per
    // permutation are order-independent, so values are unchanged.
    val perms = base
      .select(col("event_id"), col("mv"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("event_id"), col("mv"),
        explode(sequence(lit(1L), lit(200L))).as("p"))
      .withColumn("side",
        conv(substr(md5(concat(lit("pt:"), col("p").cast("string"), lit(":"),
          col("event_id").cast("string"))), lit(1), lit(8)), 16, 10)
          .cast("long") % 2)
      .groupBy(col("p"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("n1"),
        dsum(when(col("side") === 0, col("mv")).otherwise(0L), "s0"),
        dsum(when(col("side") === 1, col("mv")).otherwise(0L), "s1"))
      .filter(col("n0") > 0 && col("n1") > 0)
      .select(col("p"),
        (col("s0") / col("n0").cast("double") -
          col("s1") / col("n1").cast("double")).as("stat"))
    perms.crossJoin(broadcast(obs))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("obs")).as("obs"),
        count(lit(1)).as("n_perms"),
        sum(when(abs(col("stat")) >= abs(col("obs")), 1L).otherwise(0L))
          .as("n_ge"))
      .withColumn("p_value",
        (lit(1.0) + col("n_ge").cast("double")) /
          (lit(1.0) + col("n_perms").cast("double")))
  }

  val permtestSql: String =
    """WITH base AS (SELECT event_id, event_type,
      |    CAST(round(value * 1000000.0e0) AS BIGINT) AS mv
      |  FROM events WHERE value IS NOT NULL
      |    AND event_type IN ('click', 'purchase') AND event_id % 3 = 0),
      |obs AS (SELECT
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN mv ELSE 0 END
      |        AS DECIMAL(38,0))) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE)
      |      - CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN mv ELSE 0 END
      |        AS DECIMAL(38,0))) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
      |      AS obs
      |  FROM base),
      |perms AS (SELECT p,
      |    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CAST(CASE WHEN side = 0 THEN mv ELSE 0 END
      |      AS DECIMAL(38,0))) AS DOUBLE) AS s0,
      |    CAST(SUM(CAST(CASE WHEN side = 1 THEN mv ELSE 0 END
      |      AS DECIMAL(38,0))) AS DOUBLE) AS s1
      |  FROM (SELECT b.event_id, b.mv, r.p,
      |      CAST(CAST(concat('0x', substr(md5('pt:' || CAST(r.p AS VARCHAR)
      |        || ':' || CAST(b.event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2
      |        AS BIGINT) AS side
      |    FROM base b CROSS JOIN (SELECT unnest(range(1, 201)) AS p) r)
      |  GROUP BY p HAVING n0 > 0 AND n1 > 0),
      |st AS (SELECT p, s0 / CAST(n0 AS DOUBLE) - s1 / CAST(n1 AS DOUBLE) AS stat
      |  FROM perms)
      |SELECT o.n_a, o.n_b, o.obs,
      |  CAST(COUNT(*) AS BIGINT) AS n_perms,
      |  CAST(SUM(CASE WHEN abs(st.stat) >= abs(o.obs) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_ge,
      |  (1.0e0 + CAST(SUM(CASE WHEN abs(st.stat) >= abs(o.obs) THEN 1 ELSE 0 END)
      |    AS DOUBLE)) / (1.0e0 + CAST(COUNT(*) AS DOUBLE)) AS p_value
      |FROM st CROSS JOIN obs o
      |GROUP BY o.n_a, o.n_b, o.obs""".stripMargin

  /** Friedman's rank test for k related samples (Friedman 1937) —
    * blocks = days, treatments = event types, response = the day's
    * total value in micro-units: "do the event types rank the same
    * way day after day?", the BLOCKED companion of stats_kruskal
    * (independent groups) exactly as stats_mcnemar pairs with
    * stats_prop_ztest. Only complete blocks (all k types present
    * that day) enter, per the classical test.
    *
    * Determinism: within-block average ranks are carried DOUBLED
    * (2·cum − c + 1 over the per-(day, total) counts — an integer
    * even for ties, the stats_spearman convention), so per-type rank
    * sums and their squares stay exact integers/DECIMAL; the χ²_F
    * chain (untied-formula, ties share averaged ranks — documented)
    * divides the doubled moments once: χ² = 12/(n·k·(k+1))·(ΣR′²/4)
    * − 3n(k+1).
    *
    * Scale: one corpus aggregation to the (day, type) table; ranks,
    * block filters, and sums all run on that day-span×k alphabet.
    */
  def friedman(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"),
        col("event_type"))
      .agg(sum(round(col("value") * 1000000.0).cast("long")
        .cast("decimal(38,0)")).cast("long").as("tot"))
    val kTot = daily.select(col("event_type")).distinct()
      .agg(count(lit(1)).as("k"))
    val complete = daily.groupBy(col("day")).agg(count(lit(1)).as("kk"))
    val blocks = daily.join(complete, "day").crossJoin(broadcast(kTot))
      .filter(col("kk") === col("k"))
    val vals = blocks.groupBy(col("day"), col("tot"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("day")).orderBy(col("tot"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("r2", lit(2L) * col("cum") - col("c") + lit(1L))
      .select(col("day"), col("tot"), col("r2"))
    val perType = blocks.join(vals, Seq("day", "tot"))
      .groupBy(col("event_type"))
      .agg(sum(col("r2")).as("r2_sum"), count(lit(1)).as("n_blocks"),
        max(col("k")).as("k"))
    val chi = perType.agg(
        max(col("n_blocks")).as("n"), max(col("k")).as("k"),
        sum((col("r2_sum").cast("decimal(38,0)") * col("r2_sum"))
          .cast("decimal(38,0)")).cast("double").as("s4"))
      .withColumn("chi2", when(col("n") > 0,
        lit(12.0) / (col("n").cast("double") * col("k").cast("double") *
          (col("k").cast("double") + lit(1.0))) * (col("s4") / lit(4.0)) -
          lit(3.0) * col("n").cast("double") * (col("k").cast("double") + lit(1.0))))
      .withColumn("df", (col("k") - 1L).as("df"))
    perType.crossJoin(broadcast(chi.select(col("chi2"), col("df"))))
      .select(col("event_type"), col("r2_sum"), col("n_blocks"),
        col("chi2"), col("df"))
      .orderBy(col("event_type"))
  }

  val friedmanSql: String =
    """WITH daily AS (SELECT epoch_ms(ts) // 86400000 AS day, event_type,
      |    CAST(SUM(CAST(CAST(round(value * 1000000.0e0) AS BIGINT)
      |      AS DECIMAL(38,0))) AS BIGINT) AS tot
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |kt AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM daily),
      |comp AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS kk FROM daily GROUP BY 1),
      |blocks AS (SELECT d.* FROM daily d JOIN comp USING (day) CROSS JOIN kt
      |  WHERE comp.kk = kt.k),
      |vals AS (SELECT day, tot, CAST(COUNT(*) AS BIGINT) AS c FROM blocks
      |  GROUP BY 1, 2),
      |rv AS (SELECT day, tot,
      |    2 * CAST(SUM(c) OVER (PARTITION BY day ORDER BY tot
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - c + 1 AS r2
      |  FROM vals),
      |pt AS (SELECT b.event_type, CAST(SUM(rv.r2) AS BIGINT) AS r2_sum,
      |    CAST(COUNT(*) AS BIGINT) AS n_blocks,
      |    MAX(kt.k) AS k
      |  FROM blocks b JOIN rv ON rv.day = b.day AND rv.tot = b.tot
      |  CROSS JOIN kt GROUP BY 1),
      |chi AS (SELECT MAX(n_blocks) AS n, MAX(k) AS k,
      |    CAST(SUM(CAST(r2_sum AS HUGEINT) * r2_sum) AS DOUBLE) AS s4
      |  FROM pt),
      |cc AS (SELECT CASE WHEN n > 0 THEN
      |    12.0e0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
      |      * (CAST(k AS DOUBLE) + 1.0e0)) * (s4 / 4.0e0)
      |    - 3.0e0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0e0) END AS chi2,
      |    k - 1 AS df FROM chi)
      |SELECT pt.event_type, pt.r2_sum, pt.n_blocks, cc.chi2, cc.df
      |FROM pt CROSS JOIN cc ORDER BY pt.event_type""".stripMargin

  /** Cochran's Q (Cochran 1950) for k = 3 related binary outcomes —
    * blocks = users, treatments = {click, view, purchase}, outcome =
    * "did this user ever emit that event type?": the k-sample
    * generalization of stats_mcnemar (which it reduces to at k = 2).
    * Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_u²) with C_j the per-type
    * column totals, R_u the per-user row totals, N = ΣR_u.
    *
    * Determinism: every term is an exact integer (column totals,
    * N², ΣR_u² — DECIMAL(38,0) at scale); Q is ONE double division,
    * NULL-guarded when the denominator is 0 (every user all-0 or
    * all-1 — no within-block variation, the test is undefined).
    *
    * Scale: one per-user aggregation (map-side combinable) + one
    * 1-row fold — no join, no window.
    */
  def cochranQ(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "events")
      .filter(col("event_type").isin("click", "view", "purchase"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("x1"),
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("x2"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x3"))
      .withColumn("r", col("x1") + col("x2") + col("x3"))
    per.agg(count(lit(1)).as("n_users"),
        sum(col("x1")).as("c_click"),
        sum(col("x2")).as("c_view"),
        sum(col("x3")).as("c_purchase"),
        sum(col("r").cast("decimal(38,0)")).cast("long").as("nn"),
        sum((col("r") * col("r")).cast("decimal(38,0)")).cast("long").as("sum_r2"))
      .withColumn("sum_c2",
        col("c_click") * col("c_click") + col("c_view") * col("c_view") +
          col("c_purchase") * col("c_purchase"))
      .withColumn("den", lit(3L) * col("nn") - col("sum_r2"))
      .withColumn("q", when(col("den") > 0,
        lit(2.0) * (lit(3.0) * col("sum_c2").cast("double") -
          col("nn").cast("double") * col("nn").cast("double")) /
          col("den").cast("double")))
      .select(col("n_users"), col("c_click"), col("c_view"),
        col("c_purchase"), col("nn"), col("sum_r2"), col("q"),
        lit(2L).as("df"))
  }

  val cochranQSql: String =
    """WITH per AS (SELECT user_id,
      |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x1,
      |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x2,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x3
      |  FROM events WHERE event_type IN ('click', 'view', 'purchase')
      |  GROUP BY 1),
      |p2 AS (SELECT *, x1 + x2 + x3 AS r FROM per),
      |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(x1) AS BIGINT) AS c_click,
      |    CAST(SUM(x2) AS BIGINT) AS c_view,
      |    CAST(SUM(x3) AS BIGINT) AS c_purchase,
      |    CAST(SUM(r) AS BIGINT) AS nn,
      |    CAST(SUM(r * r) AS BIGINT) AS sum_r2
      |  FROM p2),
      |s AS (SELECT *,
      |    c_click * c_click + c_view * c_view + c_purchase * c_purchase AS sum_c2,
      |    3 * nn - sum_r2 AS den
      |  FROM agg)
      |SELECT n_users, c_click, c_view, c_purchase, nn, sum_r2,
      |  CASE WHEN den > 0 THEN 2.0e0 * (3.0e0 * CAST(sum_c2 AS DOUBLE)
      |    - CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) / CAST(den AS DOUBLE)
      |  END AS q, CAST(2 AS BIGINT) AS df
      |FROM s""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_mcnemar" -> (mcnemar _),
    "stats_cvm" -> (cvm _),
    "stats_permtest" -> (permtest _),
    "stats_cliffs" -> (cliffs _),
    "stats_ad" -> (andersonDarling _),
    "stats_friedman" -> (friedman _),
    "stats_cochranq" -> (cochranQ _))

  val oracles: Map[String, String] = Map(
    "stats_mcnemar" -> mcnemarSql,
    "stats_cvm" -> cvmSql,
    "stats_permtest" -> permtestSql,
    "stats_cliffs" -> cliffsSql,
    "stats_ad" -> andersonDarlingSql,
    "stats_friedman" -> friedmanSql,
    "stats_cochranq" -> cochranQSql)
}
