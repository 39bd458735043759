package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Statistical-inference completions for the analytics plane: the
  * remaining classical hypothesis tests a metrics platform reaches for
  * once [[Relational]]'s t-test/ANOVA/KS/χ²/Kruskal–Wallis family
  * exists — the two-sample rank test (Mann–Whitney U), the variance-
  * homogeneity gate ANOVA assumes (Brown–Forsythe / median-centered
  * Levene), and the moment-based normality check (Jarque–Bera).
  * Beyond-reference scope (the reference ships no stats layer); same
  * determinism discipline as the rest of the suite: every emitted
  * double is an exact integer escaped to double through DECIMAL(38,0)
  * sums, or a short fixed IEEE chain mirrored token-for-token by the
  * DuckDB oracle — bit-exact without rounding.
  *
  * Scale notes: both rank tests ride [[FeatureQueries.cumRanks]] /
  * `cumRanksBy` (two-level cumulative ranks — per-bucket offsets in a
  * ≤1024-row window, remainders in a bucket-keyed window), so no
  * global sort exists at any corpus size; the moment tests are one
  * keyed aggregation each.
  */
object Inference {

  /** Mann–Whitney U (Wilcoxon rank-sum) on `l_quantity`, returned
    * ('A') vs refused ('R') lineitems — the non-parametric two-sample
    * location test, with the large-sample tie-corrected normal
    * approximation. Pooled average ranks come from the two-level
    * cumulative carried DOUBLED (2·cum − c + 1) so they stay integral;
    * the per-group rank sum accumulates in DECIMAL(38,0); the tie term
    * Σ(t³−t) is an exact integer. U, μ_U, σ²_U and z are one fixed
    * IEEE chain (no continuity correction — documented choice, and the
    * oracle replays the identical chain). One pooled rank build + one
    * keyed agg; the final combine is a 2-row pivot.
    */
  def statsMannwhitney(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("g"), col("l_quantity").cast("long").as("v"))
    val vc = rows.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val rk = FeatureQueries.cumRanks(vc)
      .select(col("v"), col("c"), (lit(2L) * col("cum") - col("c") + lit(1L)).as("r2"))
    val per = rows.join(rk.select(col("v"), col("r2")), "v")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("r2").cast("decimal(38,0)")).cast("double").as("s2"))
    val tie = rk
      .agg(sum((col("c") * col("c") * col("c") - col("c")).cast("decimal(38,0)"))
        .cast("double").as("t"))
    per
      .agg(max(when(col("g") === "A", col("n_g"))).as("n_a"),
        max(when(col("g") === "R", col("n_g"))).as("n_r"),
        max(when(col("g") === "A", col("s2"))).as("s2a"))
      .crossJoin(broadcast(tie))
      .withColumn("na", col("n_a").cast("double"))
      .withColumn("nr", col("n_r").cast("double"))
      .withColumn("n", col("na") + col("nr"))
      .withColumn("u_a",
        col("s2a") / lit(2.0) - col("na") * (col("na") + lit(1.0)) / lit(2.0))
      .withColumn("var_u",
        col("na") * col("nr") / lit(12.0) *
          ((col("n") + lit(1.0)) - col("t") / (col("n") * (col("n") - lit(1.0)))))
      .select(col("n_a"), col("n_r"), col("u_a"),
        when(col("var_u") > 0.0,
          (col("u_a") - col("na") * col("nr") / lit(2.0)) / sqrt(col("var_u"))).as("z"))
  }

  val statsMannwhitneySql: String =
    """WITH rows0 AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      |vc AS (SELECT v, COUNT(*) AS c FROM rows0 GROUP BY 1),
      |cm AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM vc),
      |rk AS (SELECT v, c, 2 * cum - c + 1 AS r2 FROM cm),
      |per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
      |    CAST(SUM(CAST(r2 AS DECIMAL(38,0))) AS DOUBLE) AS s2
      |  FROM rows0 JOIN rk USING (v) GROUP BY g),
      |tie AS (SELECT CAST(SUM(CAST(c * c * c - c AS DECIMAL(38,0))) AS DOUBLE) AS t FROM rk),
      |piv AS (SELECT MAX(CASE WHEN g = 'A' THEN n_g END) AS n_a,
      |    MAX(CASE WHEN g = 'R' THEN n_g END) AS n_r,
      |    MAX(CASE WHEN g = 'A' THEN s2 END) AS s2a FROM per),
      |m AS (SELECT n_a, n_r, s2a, CAST(n_a AS DOUBLE) AS na,
      |    CAST(n_r AS DOUBLE) AS nr, t FROM piv CROSS JOIN tie),
      |u AS (SELECT *, na + nr AS n,
      |    s2a / 2.0e0 - na * (na + 1.0e0) / 2.0e0 AS u_a FROM m),
      |v2 AS (SELECT *, na * nr / 12.0e0 *
      |    ((n + 1.0e0) - t / (n * (n - 1.0e0))) AS var_u FROM u)
      |SELECT n_a, n_r, u_a,
      |  CASE WHEN var_u > 0 THEN (u_a - na * nr / 2.0e0) / sqrt(var_u) END AS z
      |FROM v2""".stripMargin

  /** Brown–Forsythe test (Levene with median centers) for variance
    * homogeneity of `l_quantity` across return flags — the gate a
    * careful analyst runs before trusting [[Relational.statsAnova]]'s
    * pooled-variance F. Per-group LOWER medians are rank selections on
    * the grouped two-level cumulative (no per-group sort: the median is
    * the smallest value whose cumulative count reaches ⌈n/2⌉ — a
    * value-selection, deterministic under ties by construction);
    * absolute deviations |v − med| are exact integers, so the one-way
    * ANOVA on them runs on DECIMAL(38,0) moments. The only doubles are
    * the SSW/SSB folds — both ordered group-by-group (sort_array fold,
    * the stats_entropy discipline) — and the final F chain. Two keyed
    * aggregations + one ≤|flags|-row combine.
    */
  def statsLevene(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_quantity").cast("long").as("v"))
    val vc = rows.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    // rank arithmetic must be FLOOR division on both sides ((n+1)//2):
    // Spark's `/` on longs is double division, so cast the truncation
    val rank = ((col("n") + 1) / 2).cast("long")
    val med = FeatureQueries.cumRanksBy(vc)
      .filter(col("cum") >= rank && col("cum") - col("c") < rank)
      .select(col("g"), col("v").as("med"))
    val per = rows.join(broadcast(med), "g")
      .withColumn("d", abs(col("v") - col("med")))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("d").cast("decimal(38,0)")).cast("double").as("s1"),
        sum((col("d") * col("d")).cast("decimal(38,0)")).cast("double").as("s2"))
    per
      .agg(sort_array(collect_list(struct(col("g"), col("n_g"), col("s1"), col("s2")))).as("gs"),
        sum(col("n_g")).as("n"), count(lit(1)).as("k"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("kd", col("k").cast("double"))
      .withColumn("gs1", aggregate(
        transform(col("gs"), x => x.getField("s1")), lit(0.0), (a, b) => a + b))
      .withColumn("gm", col("gs1") / col("nd"))
      .withColumn("ssw", aggregate(
        transform(col("gs"), x =>
          x.getField("s2") -
            x.getField("s1") * x.getField("s1") / x.getField("n_g").cast("double")),
        lit(0.0), (a, b) => a + b))
      .withColumn("ssb", aggregate(
        transform(col("gs"), x =>
          x.getField("n_g").cast("double") *
            (x.getField("s1") / x.getField("n_g").cast("double") - col("gm")) *
            (x.getField("s1") / x.getField("n_g").cast("double") - col("gm"))),
        lit(0.0), (a, b) => a + b))
      .select(col("k"), col("n"), col("ssb"), col("ssw"),
        when(col("ssw") > 0.0 && col("nd") > col("kd") && col("kd") > 1.0,
          (col("ssb") / (col("kd") - lit(1.0))) / (col("ssw") / (col("nd") - col("kd"))))
          .as("f"))
  }

  val statsLeveneSql: String =
    """WITH rows0 AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v FROM lineitem),
      |vc AS (SELECT g, v, COUNT(*) AS c FROM rows0 GROUP BY 1, 2),
      |cm AS (SELECT g, v, c,
      |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum,
      |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n FROM vc),
      |med AS (SELECT g, v AS med FROM cm
      |  WHERE cum >= (n + 1) // 2 AND cum - c < (n + 1) // 2),
      |per AS (SELECT r.g, CAST(COUNT(*) AS BIGINT) AS n_g,
      |    CAST(SUM(CAST(abs(v - med) AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(abs(v - med) * abs(v - med) AS DECIMAL(38,0))) AS DOUBLE) AS s2
      |  FROM rows0 r JOIN med USING (g) GROUP BY r.g),
      |agg AS (SELECT list(struct_pack(g := g, n_g := n_g, s1 := s1, s2 := s2) ORDER BY g) AS gs,
      |    CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM per),
      |c1 AS (SELECT *, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
      |    CAST(list_reduce(list_prepend(0.0e0,
      |      list_transform(gs, x -> x.s1)), (a, b) -> a + b) AS DOUBLE) AS gs1
      |  FROM agg),
      |c2 AS (SELECT *, gs1 / nd AS gm FROM c1),
      |c3 AS (SELECT *,
      |    CAST(list_reduce(list_prepend(0.0e0, list_transform(gs,
      |      x -> x.s2 - x.s1 * x.s1 / CAST(x.n_g AS DOUBLE))), (a, b) -> a + b) AS DOUBLE) AS ssw,
      |    CAST(list_reduce(list_prepend(0.0e0, list_transform(gs,
      |      x -> CAST(x.n_g AS DOUBLE) *
      |        (x.s1 / CAST(x.n_g AS DOUBLE) - gm) *
      |        (x.s1 / CAST(x.n_g AS DOUBLE) - gm))), (a, b) -> a + b) AS DOUBLE) AS ssb
      |  FROM c2)
      |SELECT k, n, ssb, ssw,
      |  CASE WHEN ssw > 0 AND nd > kd AND kd > 1
      |    THEN (ssb / (kd - 1.0e0)) / (ssw / (nd - kd)) END AS f
      |FROM c3""".stripMargin

  /** Jarque–Bera normality check of `l_quantity` per return flag:
    * sample skewness and excess-kurtosis-free kurtosis from the first
    * four raw moments, JB = n/6·(S² + (K−3)²/4). Quantity is a small
    * integer so q⁴ sums stay minuscule in DECIMAL(38,0) — all four
    * moments are exact integers escaped to double once; the central-
    * moment expansion, S, K and JB are one fixed IEEE chain (sqrt only,
    * never pow — pow is not correctly rounded) mirrored token-for-token
    * by the oracle. One keyed aggregation; identical plan at any scale.
    */
  def statsJarqueBera(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_quantity").cast("long").as("v"))
    def dsum(c: org.apache.spark.sql.Column, out: String) =
      sum(c.cast("decimal(38,0)")).cast("double").as(out)
    li.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), count(lit(1)).cast("double").as("n"),
        dsum(col("v"), "s1"), dsum(col("v") * col("v"), "s2"),
        dsum(col("v") * col("v") * col("v"), "s3"),
        dsum(col("v") * col("v") * col("v") * col("v"), "s4"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("m2", col("s2") / col("n") - col("mean") * col("mean"))
      .withColumn("m3",
        col("s3") / col("n") - lit(3.0) * col("mean") * (col("s2") / col("n")) +
          lit(2.0) * col("mean") * col("mean") * col("mean"))
      .withColumn("m4",
        col("s4") / col("n") - lit(4.0) * col("mean") * (col("s3") / col("n")) +
          lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n")) -
          lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
      .withColumn("skew",
        when(col("m2") > 0.0, col("m3") / (col("m2") * sqrt(col("m2")))))
      .withColumn("kurt",
        when(col("m2") > 0.0, col("m4") / (col("m2") * col("m2"))))
      .select(col("g").as("l_returnflag"), col("n_g").as("n"),
        col("skew"), col("kurt"),
        when(col("m2") > 0.0,
          col("n") / lit(6.0) *
            (col("skew") * col("skew") +
              (col("kurt") - lit(3.0)) * (col("kurt") - lit(3.0)) / lit(4.0))).as("jb"))
      .orderBy(col("l_returnflag"))
  }

  val statsJarqueBeraSql: String =
    """WITH m AS (SELECT l_returnflag AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(v * v AS DECIMAL(38,0))) AS DOUBLE) AS s2,
      |    CAST(SUM(CAST(v * v * v AS DECIMAL(38,0))) AS DOUBLE) AS s3,
      |    CAST(SUM(CAST(v * v * v * v AS DECIMAL(38,0))) AS DOUBLE) AS s4
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v FROM lineitem)
      |  GROUP BY 1),
      |c1 AS (SELECT *, s1 / n AS mean FROM m),
      |c2 AS (SELECT *, s2 / n - mean * mean AS m2,
      |    s3 / n - 3.0e0 * mean * (s2 / n) + 2.0e0 * mean * mean * mean AS m3,
      |    s4 / n - 4.0e0 * mean * (s3 / n) + 6.0e0 * mean * mean * (s2 / n)
      |      - 3.0e0 * mean * mean * mean * mean AS m4
      |  FROM c1),
      |c3 AS (SELECT *,
      |    CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END AS skew,
      |    CASE WHEN m2 > 0 THEN m4 / (m2 * m2) END AS kurt
      |  FROM c2)
      |SELECT g AS l_returnflag, n_g AS n, skew, kurt,
      |  CASE WHEN m2 > 0 THEN n / 6.0e0 *
      |    (skew * skew + (kurt - 3.0e0) * (kurt - 3.0e0) / 4.0e0) END AS jb
      |FROM c3 ORDER BY l_returnflag""".stripMargin

  /** Cohen's d (+ Hedges' g small-sample correction) for returned vs
    * refused quantity — the effect size a metrics review demands next
    * to [[Relational.statsTtest]]'s p-value. Sample variances from
    * DECIMAL(38,0) moments, pooled s by the (n−1)-weighted formula,
    * d and the g correction one sqrt-only IEEE chain. One keyed
    * aggregation + a 2-row pivot.
    */
  def statsCohensD(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("g"), col("l_quantity").cast("long").as("v"))
    def dsum(c: org.apache.spark.sql.Column, out: String) =
      sum(c.cast("decimal(38,0)")).cast("double").as(out)
    rows.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), count(lit(1)).cast("double").as("n"),
        dsum(col("v"), "s1"), dsum(col("v") * col("v"), "s2"))
      .withColumn("m", col("s1") / col("n"))
      .withColumn("ss", col("s2") - col("s1") * col("s1") / col("n"))
      .agg(max(when(col("g") === "A", col("n"))).as("na"),
        max(when(col("g") === "R", col("n"))).as("nr"),
        max(when(col("g") === "A", col("m"))).as("ma"),
        max(when(col("g") === "R", col("m"))).as("mr"),
        max(when(col("g") === "A", col("ss"))).as("ssa"),
        max(when(col("g") === "R", col("ss"))).as("ssr"))
      .withColumn("sp",
        sqrt((col("ssa") + col("ssr")) / (col("na") + col("nr") - lit(2.0))))
      .withColumn("d", when(col("sp") > 0.0, (col("ma") - col("mr")) / col("sp")))
      .select(col("na").cast("long").as("n_a"), col("nr").cast("long").as("n_r"),
        col("ma").as("mean_a"), col("mr").as("mean_r"), col("sp").as("s_pooled"),
        col("d"),
        (col("d") * (lit(1.0) - lit(3.0) /
          (lit(4.0) * (col("na") + col("nr")) - lit(9.0)))).as("g_hedges"))
  }

  val statsCohensDSql: String =
    """WITH m AS (SELECT l_returnflag AS g, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(v * v AS DECIMAL(38,0))) AS DOUBLE) AS s2
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v
      |    FROM lineitem WHERE l_returnflag IN ('A', 'R')) GROUP BY 1),
      |c AS (SELECT g, n, s1 / n AS mean, s2 - s1 * s1 / n AS ss FROM m),
      |p AS (SELECT MAX(CASE WHEN g = 'A' THEN n END) AS na,
      |    MAX(CASE WHEN g = 'R' THEN n END) AS nr,
      |    MAX(CASE WHEN g = 'A' THEN mean END) AS ma,
      |    MAX(CASE WHEN g = 'R' THEN mean END) AS mr,
      |    MAX(CASE WHEN g = 'A' THEN ss END) AS ssa,
      |    MAX(CASE WHEN g = 'R' THEN ss END) AS ssr FROM c),
      |q AS (SELECT *, sqrt((ssa + ssr) / (na + nr - 2.0e0)) AS sp FROM p),
      |r AS (SELECT *, CASE WHEN sp > 0 THEN (ma - mr) / sp END AS d FROM q)
      |SELECT CAST(na AS BIGINT) AS n_a, CAST(nr AS BIGINT) AS n_r,
      |  ma AS mean_a, mr AS mean_r, sp AS s_pooled, d,
      |  d * (1.0e0 - 3.0e0 / (4.0e0 * (na + nr) - 9.0e0)) AS g_hedges
      |FROM r""".stripMargin

  /** Cramér's V — the effect size for the (returnflag × linestatus)
    * contingency: observed counts are integers, expected counts and the
    * χ² fold run in CELL ORDER (sort_array — the stats_entropy
    * discipline), V = sqrt(χ²/(n·min(r−1,c−1))). One keyed count
    * aggregation; the fold is over the ≤|r|·|c| cell list.
    */
  def statsCramersV(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("r"), col("l_linestatus").as("c"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("r")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("c")).agg(sum(col("o")).as("ct"))
    cells.join(broadcast(rt), "r").join(broadcast(ct), "c")
      .agg(sum(col("o")).as("n"),
        countDistinct(col("r")).as("nr"), countDistinct(col("c")).as("nc"),
        sort_array(collect_list(struct(col("r"), col("c"), col("o"),
          col("rt"), col("ct")))).as("cs"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("chi2", aggregate(
        transform(col("cs"), x => {
          val e = x.getField("rt").cast("double") *
            x.getField("ct").cast("double") / col("nd")
          (x.getField("o").cast("double") - e) *
            (x.getField("o").cast("double") - e) / e
        }),
        lit(0.0), (a, b) => a + b))
      .select(col("n"), col("nr"), col("nc"), col("chi2"),
        when(least(col("nr"), col("nc")) > 1L,
          sqrt(col("chi2") / (col("nd") *
            (least(col("nr"), col("nc")) - lit(1L)).cast("double")))).as("v"))
  }

  val statsCramersVSql: String =
    """WITH cells AS (SELECT l_returnflag AS r, l_linestatus AS c,
      |    CAST(COUNT(*) AS BIGINT) AS o FROM lineitem GROUP BY 1, 2),
      |rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY r),
      |ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY c),
      |j AS (SELECT cells.r, cells.c, o, rt.rt, ct.ct
      |  FROM cells JOIN rt USING (r) JOIN ct USING (c)),
      |agg AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
      |    CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
      |    CAST(COUNT(DISTINCT c) AS BIGINT) AS nc,
      |    list(struct_pack(r := r, c := c, o := o, rt := rt, ct := ct)
      |      ORDER BY r, c) AS cs
      |  FROM j),
      |f AS (SELECT n, nr, nc, CAST(n AS DOUBLE) AS nd,
      |    CAST(list_reduce(list_prepend(0.0e0, list_transform(cs,
      |      x -> (CAST(x.o AS DOUBLE) - CAST(x.rt AS DOUBLE) * CAST(x.ct AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(x.o AS DOUBLE) - CAST(x.rt AS DOUBLE) * CAST(x.ct AS DOUBLE) / CAST(n AS DOUBLE))
      |        / (CAST(x.rt AS DOUBLE) * CAST(x.ct AS DOUBLE) / CAST(n AS DOUBLE)))),
      |      (a, b) -> a + b) AS DOUBLE) AS chi2
      |  FROM agg)
      |SELECT n, nr, nc, chi2,
      |  CASE WHEN least(nr, nc) > 1
      |    THEN sqrt(chi2 / (nd * CAST(least(nr, nc) - 1 AS DOUBLE))) END AS v
      |FROM f""".stripMargin

  /** Ljung–Box white-noise test (Q over lags 1..5) on each user's
    * event-value series — the autocorrelation portmanteau diagnostic
    * that gates residual analysis after [[TimeSeriesQueries]]'s
    * forecast/backtest family; extends the lag-1 `ts_autocorr` to the
    * full statistic. Users with n ≥ 12 (so n−k stays comfortably
    * positive). ρ_k shares ts_autocorr's mean-centered fold shape
    * (zip_with over shifted slices, left-to-right sum starting at 0.0
    * ≡ DuckDB's list_reduce — 0.0+x is exact); Q is one fixed IEEE
    * chain with the lag terms summed left-associatively k=1..5,
    * mirrored token-for-token by the oracle. Scale: one per-user
    * aggregation; the arrays distribute over users (ts_theilsen
    * shape).
    */
  def tsLjungbox(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
    val base = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts_ms"), col("event_id"),
        col("value")))).as("arr"))
      .withColumn("vs", transform(col("arr"), x => x.getField("value")))
      .withColumn("n", size(col("vs")))
      .filter(col("n") >= 12)
      .withColumn("m",
        aggregate(col("vs"), lit(0.0), (a, v) => a + v) / col("n").cast("double"))
      .withColumn("den", aggregate(
        transform(col("vs"), v => (v - col("m")) * (v - col("m"))),
        lit(0.0), (a, v) => a + v))
    val withR = (1 to 5).foldLeft(base) { (df, k) =>
      df.withColumn(s"r$k", aggregate(
        zip_with(slice(col("vs"), lit(1), col("n") - k),
          slice(col("vs"), lit(k + 1), col("n") - k),
          (a, b) => (a - col("m")) * (b - col("m"))),
        lit(0.0), (a, v) => a + v) / col("den"))
    }
    withR
      .withColumn("nd", col("n").cast("double"))
      .select(col("user_id"), col("n").cast("long").as("n"),
        when(col("den") === 0.0, lit(null).cast("double"))
          .otherwise(col("nd") * (col("nd") + lit(2.0)) *
            (col("r1") * col("r1") / (col("nd") - lit(1.0)) +
             col("r2") * col("r2") / (col("nd") - lit(2.0)) +
             col("r3") * col("r3") / (col("nd") - lit(3.0)) +
             col("r4") * col("r4") / (col("nd") - lit(4.0)) +
             col("r5") * col("r5") / (col("nd") - lit(5.0)))).as("q5"))
      .orderBy(col("user_id"))
  }

  val tsLjungboxSql: String =
    """WITH s AS (SELECT user_id, list(value ORDER BY epoch_ms(ts), event_id) AS vs
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
      |st AS (SELECT user_id, vs, len(vs) AS n,
      |    list_reduce(list_prepend(0.0e0, vs), (a, v) -> a + v)
      |      / CAST(len(vs) AS DOUBLE) AS m
      |  FROM s WHERE len(vs) >= 12),
      |dn AS (SELECT user_id, vs, n, m,
      |    list_reduce(list_prepend(0.0e0,
      |      list_transform(vs, v -> (v - m) * (v - m))), (a, v) -> a + v) AS den
      |  FROM st),
      |rs AS (SELECT user_id, n, den,
      |    list_reduce(list_prepend(0.0e0, list_transform(range(1, n - 1 + 1),
      |      i -> (vs[i] - m) * (vs[i + 1] - m))), (a, v) -> a + v) / den AS r1,
      |    list_reduce(list_prepend(0.0e0, list_transform(range(1, n - 2 + 1),
      |      i -> (vs[i] - m) * (vs[i + 2] - m))), (a, v) -> a + v) / den AS r2,
      |    list_reduce(list_prepend(0.0e0, list_transform(range(1, n - 3 + 1),
      |      i -> (vs[i] - m) * (vs[i + 3] - m))), (a, v) -> a + v) / den AS r3,
      |    list_reduce(list_prepend(0.0e0, list_transform(range(1, n - 4 + 1),
      |      i -> (vs[i] - m) * (vs[i + 4] - m))), (a, v) -> a + v) / den AS r4,
      |    list_reduce(list_prepend(0.0e0, list_transform(range(1, n - 5 + 1),
      |      i -> (vs[i] - m) * (vs[i + 5] - m))), (a, v) -> a + v) / den AS r5
      |  FROM dn)
      |SELECT user_id, CAST(n AS BIGINT) AS n,
      |  CASE WHEN den = 0.0e0 THEN NULL ELSE
      |    CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0e0) *
      |    (r1 * r1 / (CAST(n AS DOUBLE) - 1.0e0) +
      |     r2 * r2 / (CAST(n AS DOUBLE) - 2.0e0) +
      |     r3 * r3 / (CAST(n AS DOUBLE) - 3.0e0) +
      |     r4 * r4 / (CAST(n AS DOUBLE) - 4.0e0) +
      |     r5 * r5 / (CAST(n AS DOUBLE) - 5.0e0)) END AS q5
      |FROM rs ORDER BY user_id""".stripMargin

  /** Partial autocorrelations at lags 1–3 (Durbin–Levinson closed
    * forms) per user series — the Box–Jenkins AR-order diagnostic that
    * pairs with [[tsLjungbox]]: PACF cutting off after lag p suggests
    * AR(p). ρ₁..ρ₃ share the ljungbox fold shape; φ11=ρ1,
    * φ22=(ρ2−ρ1²)/(1−ρ1²), φ21=ρ1·(1−φ22), and
    * φ33=(ρ3−φ21ρ2−φ22ρ1)/(1−φ21ρ1−φ22ρ2) are fixed IEEE chains
    * mirrored token-for-token (zero denominators → NULL). Same scale
    * shape as ts_autocorr: one per-user aggregation.
    */
  def tsPacf(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
    val base = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts_ms"), col("event_id"),
        col("value")))).as("arr"))
      .withColumn("vs", transform(col("arr"), x => x.getField("value")))
      .withColumn("n", size(col("vs")))
      .filter(col("n") >= 12)
      .withColumn("m",
        aggregate(col("vs"), lit(0.0), (a, v) => a + v) / col("n").cast("double"))
      .withColumn("den", aggregate(
        transform(col("vs"), v => (v - col("m")) * (v - col("m"))),
        lit(0.0), (a, v) => a + v))
    val withR = (1 to 3).foldLeft(base) { (df, k) =>
      df.withColumn(s"r$k", aggregate(
        zip_with(slice(col("vs"), lit(1), col("n") - k),
          slice(col("vs"), lit(k + 1), col("n") - k),
          (a, b) => (a - col("m")) * (b - col("m"))),
        lit(0.0), (a, v) => a + v) / col("den"))
    }
    withR
      .withColumn("p22den", lit(1.0) - col("r1") * col("r1"))
      .withColumn("p22",
        when(col("p22den") === 0.0, lit(null).cast("double"))
          .otherwise((col("r2") - col("r1") * col("r1")) / col("p22den")))
      .withColumn("p21", col("r1") * (lit(1.0) - col("p22")))
      .withColumn("p33den",
        lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2"))
      .select(col("user_id"), col("n").cast("long").as("n"),
        when(col("den") === 0.0, lit(null).cast("double"))
          .otherwise(col("r1")).as("pacf1"),
        when(col("den") === 0.0, lit(null).cast("double"))
          .otherwise(col("p22")).as("pacf2"),
        when(col("den") === 0.0 || col("p33den") === 0.0,
          lit(null).cast("double"))
          .otherwise((col("r3") - col("p21") * col("r2") -
            col("p22") * col("r1")) / col("p33den")).as("pacf3"))
      .orderBy(col("user_id"))
  }

  val tsPacfSql: String =
    """WITH s AS (SELECT user_id, list(value ORDER BY epoch_ms(ts), event_id) AS vs
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
      |st AS (SELECT user_id, vs, len(vs) AS n,
      |    list_reduce(list_prepend(0.0e0, vs), (a, v) -> a + v)
      |      / CAST(len(vs) AS DOUBLE) AS m
      |  FROM s WHERE len(vs) >= 12),
      |dn AS (SELECT user_id, vs, n, m,
      |    list_reduce(list_prepend(0.0e0,
      |      list_transform(vs, v -> (v - m) * (v - m))), (a, v) -> a + v) AS den
      |  FROM st),
      |rs AS (SELECT user_id, n, den,
      |    list_reduce(list_prepend(0.0e0, list_transform(range(1, n - 1 + 1),
      |      i -> (vs[i] - m) * (vs[i + 1] - m))), (a, v) -> a + v) / den AS r1,
      |    list_reduce(list_prepend(0.0e0, list_transform(range(1, n - 2 + 1),
      |      i -> (vs[i] - m) * (vs[i + 2] - m))), (a, v) -> a + v) / den AS r2,
      |    list_reduce(list_prepend(0.0e0, list_transform(range(1, n - 3 + 1),
      |      i -> (vs[i] - m) * (vs[i + 3] - m))), (a, v) -> a + v) / den AS r3
      |  FROM dn),
      |p2 AS (SELECT *, 1.0e0 - r1 * r1 AS p22den FROM rs),
      |p3 AS (SELECT *,
      |    CASE WHEN p22den = 0.0e0 THEN NULL
      |         ELSE (r2 - r1 * r1) / p22den END AS p22
      |  FROM p2),
      |p4 AS (SELECT *, r1 * (1.0e0 - p22) AS p21 FROM p3),
      |p5 AS (SELECT *, 1.0e0 - p21 * r1 - p22 * r2 AS p33den FROM p4)
      |SELECT user_id, CAST(n AS BIGINT) AS n,
      |  CASE WHEN den = 0.0e0 THEN NULL ELSE r1 END AS pacf1,
      |  CASE WHEN den = 0.0e0 THEN NULL ELSE p22 END AS pacf2,
      |  CASE WHEN den = 0.0e0 OR p33den = 0.0e0 THEN NULL
      |       ELSE (r3 - p21 * r2 - p22 * r1) / p33den END AS pacf3
      |FROM p5 ORDER BY user_id""".stripMargin

  /** Rescaled-range (Hurst) analysis per user series: the average
    * R/S statistic at dyadic block sizes w ∈ {8,16,32} — Hurst's
    * long-memory diagnostic (H ≈ log₂(rs32/rs8)/2 for the two-point
    * estimate; the LOG stays with the analyst because transcendentals
    * don't cross engines — `rs_ratio` ships the exact ratio instead).
    * Per block: R = range of the mean-centered prefix sums (3-slot
    * `[cum, max, min]` DOUBLE-list fold), S = population std
    * (sqrt-only chain); blocks with S=0 are skipped via a 2-slot
    * `[sum, count]` fold. Every fold is left-assoc and inlined
    * token-identically in the oracle. Scale: per-user arrays (one
    * keyed aggregation); block scans are linear in series length.
    */
  def statsHurst(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
    val base = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts_ms"), col("event_id"),
        col("value")))).as("arr"))
      .withColumn("vs", transform(col("arr"), x => x.getField("value")))
      .withColumn("n", size(col("vs")))
      .filter(col("n") >= 32)
    def rsAvg(w: Int): Column = {
      val wd = lit(w.toDouble)
      val nb = (col("n") / w).cast("long")
      val fold = aggregate(sequence(lit(1L), nb),
        array(lit(0.0), lit(0.0)), (acc, b) => {
          val win = slice(col("vs"), ((b - 1L) * w + 1L).cast("int"), lit(w))
          val mu = aggregate(win, lit(0.0), (a, v) => a + v) / wd
          val sd = sqrt(aggregate(transform(win, x => (x - mu) * (x - mu)),
            lit(0.0), (a, v) => a + v) / wd)
          val ext = aggregate(win, array(lit(0.0), lit(-1e18), lit(1e18)),
            (e, x) => array(
              element_at(e, 1) + (x - mu),
              greatest(element_at(e, 2), element_at(e, 1) + (x - mu)),
              least(element_at(e, 3), element_at(e, 1) + (x - mu))))
          val r = element_at(ext, 2) - element_at(ext, 3)
          when(sd > 0.0,
            array(element_at(acc, 1) + r / sd, element_at(acc, 2) + 1.0))
            .otherwise(acc)
        })
      fold
    }
    // cache barrier between the block folds and their 3-way element
    // reads: each [sum,count] fold runs ONCE here; the final select
    // reads materialized columns (measured 18.7 s → ~2 s at sf0.1)
    val folds = base.select(col("user_id"), col("n").cast("long").as("n"),
      rsAvg(8).as("f8"), rsAvg(16).as("f16"), rsAvg(32).as("f32"))
      .cache()
    def rs(f: String): Column =
      when(element_at(col(f), 2) > 0.0,
        element_at(col(f), 1) / element_at(col(f), 2))
        .otherwise(lit(null).cast("double"))
    folds.select(col("user_id"), col("n"),
      rs("f8").as("rs8"), rs("f16").as("rs16"), rs("f32").as("rs32"))
      .withColumn("rs_ratio", col("rs32") / col("rs8"))
      .orderBy(col("user_id"))
  }

  val statsHurstSql: String = {
    def rsSql(w: Int): String = {
      val win = s"list_slice(vs, (CAST(x[1] AS BIGINT) - 1) * $w + 1, " +
        s"(CAST(x[1] AS BIGINT) - 1) * $w + $w)"
      val mu = s"list_reduce(list_prepend(0.0e0, $win), (a, v) -> a + v) / $w.0e0"
      val sd = s"sqrt(list_reduce(list_prepend(0.0e0, list_transform($win, " +
        s"y -> (y - $mu) * (y - $mu))), (a, v) -> a + v) / $w.0e0)"
      val ext = s"list_reduce(list_prepend([0.0e0, -1.0e18, 1.0e18]::DOUBLE[], " +
        s"list_transform($win, y -> [y, 0.0e0, 0.0e0]::DOUBLE[])), " +
        s"(e, z) -> [e[1] + (z[1] - $mu), " +
        s"greatest(e[2], e[1] + (z[1] - $mu)), " +
        s"least(e[3], e[1] + (z[1] - $mu))]::DOUBLE[])"
      val r = s"($ext)[2] - ($ext)[3]"
      val fold = s"list_reduce(list_prepend([0.0e0, 0.0e0]::DOUBLE[], " +
        s"list_transform(range(1, (n // $w) + 1), b -> [CAST(b AS DOUBLE), 0.0e0]::DOUBLE[])), " +
        s"(acc, x) -> CASE WHEN $sd > 0.0e0 " +
        s"THEN [acc[1] + ($r) / ($sd), acc[2] + 1.0e0]::DOUBLE[] ELSE acc END)"
      s"CASE WHEN ($fold)[2] > 0.0e0 THEN ($fold)[1] / ($fold)[2] END"
    }
    s"""WITH s AS (SELECT user_id, list(value ORDER BY epoch_ms(ts), event_id) AS vs
       |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
       |st AS (SELECT user_id, vs, len(vs) AS n FROM s WHERE len(vs) >= 32),
       |o AS (SELECT user_id, CAST(n AS BIGINT) AS n,
       |    ${rsSql(8)} AS rs8,
       |    ${rsSql(16)} AS rs16,
       |    ${rsSql(32)} AS rs32
       |  FROM st)
       |SELECT user_id, n, rs8, rs16, rs32, rs32 / rs8 AS rs_ratio
       |FROM o ORDER BY user_id""".stripMargin
  }

  /** Two-proportion z-test on the ERROR RATE (error events over all
    * events), weekend against weekday traffic — the A/B-testing
    * workhorse applied as an ops regression gate. Day-of-week via the
    * engine-neutral integer convention `(day+4) mod 7` (ts_seasonal;
    * 1970-01-01 was a Thursday, so +4 makes 0=Sunday). Everything up
    * to the four counts is integer-exact (successes ⊆ trials by
    * construction); p̂s, the pooled p, and z are one fixed sqrt-only
    * IEEE chain mirrored token-for-token. One conditional-count
    * aggregation.
    */
  def statsPropZtest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_type"),
        pmod((unix_millis(col("ts")) / lit(86400000L)).cast("long") + 4L, lit(7L))
          .as("dow"))
      .withColumn("wk", col("dow").isin(0L, 6L))
    ev.agg(
      sum(when(col("wk"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("wk") && col("event_type") === "error", 1L).otherwise(0L)).as("x_a"),
      sum(when(!col("wk"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("wk") && col("event_type") === "error", 1L).otherwise(0L)).as("x_b"))
      .withColumn("p_a", when(col("n_a") > 0,
        col("x_a").cast("double") / col("n_a").cast("double")))
      .withColumn("p_b", when(col("n_b") > 0,
        col("x_b").cast("double") / col("n_b").cast("double")))
      .withColumn("p", when(col("n_a") + col("n_b") > 0,
        (col("x_a") + col("x_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("p_a"), col("p_b"),
        when(col("n_a") > 0 && col("n_b") > 0 &&
          col("p") > 0.0 && col("p") < 1.0,
          (col("p_a") - col("p_b")) /
            sqrt(col("p") * (lit(1.0) - col("p")) *
              (lit(1.0) / col("n_a").cast("double") +
                lit(1.0) / col("n_b").cast("double")))).as("z"))
  }

  val statsPropZtestSql: String =
    """WITH ev AS (SELECT event_type,
      |    ((epoch_ms(ts) // 86400000 + 4) % 7 + 7) % 7 AS dow
      |  FROM events),
      |c AS (SELECT
      |    CAST(SUM(CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN dow IN (0, 6) AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
      |    CAST(SUM(CASE WHEN dow NOT IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN dow NOT IN (0, 6) AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS x_b
      |  FROM ev),
      |p AS (SELECT *,
      |    CASE WHEN n_a > 0 THEN CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS p_a,
      |    CASE WHEN n_b > 0 THEN CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS p_b,
      |    CASE WHEN n_a + n_b > 0
      |      THEN CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) END AS p
      |  FROM c)
      |SELECT n_a, x_a, n_b, x_b, p_a, p_b,
      |  CASE WHEN n_a > 0 AND n_b > 0 AND p > 0.0e0 AND p < 1.0e0
      |    THEN (p_a - p_b) / sqrt(p * (1.0e0 - p) *
      |      (1.0e0 / CAST(n_a AS DOUBLE) + 1.0e0 / CAST(n_b AS DOUBLE)))
      |  END AS z
      |FROM p""".stripMargin

  /** CUPED variance reduction (Deng et al. 2013, WSDM — "Improving the
    * Sensitivity of Online Controlled Experiments"): split each user's
    * activity at day 15 into a pre-period covariate X and an
    * experiment metric Y (summed `value`, exact via DECIMAL(38,2);
    * cross-moments DECIMAL(38,4) — scaled units stay well under 2^53
    * at bench scale), then θ* = cov(X,Y)/var(X) and the achieved
    * variance-reduction fraction ρ² = cov²/(var·var) — exactly what an
    * experimentation platform reports when deciding whether CUPED pays
    * for a metric. SS forms (n·Σxy − ΣxΣy etc.) keep every double one
    * fixed chain from exact decimal sums. One keyed per-user
    * aggregation + a 1-row moment combine.
    */
  def evalCuped(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      .select(col("user_id"), col("value"),
        (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
    val d0 = ev.agg(min(col("day")).as("d0"))
    val per = ev.crossJoin(broadcast(d0))
      .withColumn("pre", col("day") < col("d0") + 15L)
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("value")).otherwise(lit(0.0))
          .cast("decimal(38,2)")).as("x"),
        sum(when(!col("pre"), col("value")).otherwise(lit(0.0))
          .cast("decimal(38,2)")).as("y"))
    per.agg(count(lit(1)).as("n_users"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,4)")).cast("double").as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,4)")).cast("double").as("syy"),
      sum((col("x") * col("y")).cast("decimal(38,4)")).cast("double").as("sxy"))
      .withColumn("nd", col("n_users").cast("double"))
      .withColumn("cov_ss", col("nd") * col("sxy") - col("sx") * col("sy"))
      .withColumn("vx_ss", col("nd") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy_ss", col("nd") * col("syy") - col("sy") * col("sy"))
      .select(col("n_users"),
        when(col("vx_ss") > 0.0, col("cov_ss") / col("vx_ss")).as("theta"),
        when(col("vx_ss") > 0.0 && col("vy_ss") > 0.0,
          col("cov_ss") * col("cov_ss") / (col("vx_ss") * col("vy_ss")))
          .as("var_reduction"))
  }

  val evalCupedSql: String =
    """WITH ev AS (SELECT user_id, value, epoch_ms(ts) // 86400000 AS day
      |  FROM events WHERE value IS NOT NULL),
      |d0 AS (SELECT MIN(day) AS d0 FROM ev),
      |per AS (SELECT user_id,
      |    SUM(CAST(CASE WHEN day < d0 + 15 THEN value ELSE 0.0e0 END AS DECIMAL(38,2))) AS x,
      |    SUM(CAST(CASE WHEN NOT (day < d0 + 15) THEN value ELSE 0.0e0 END AS DECIMAL(38,2))) AS y
      |  FROM ev CROSS JOIN d0 GROUP BY user_id),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy
      |  FROM per),
      |ss AS (SELECT *, CAST(n_users AS DOUBLE) AS nd FROM m),
      |f AS (SELECT *, nd * sxy - sx * sy AS cov_ss,
      |    nd * sxx - sx * sx AS vx_ss, nd * syy - sy * sy AS vy_ss
      |  FROM ss)
      |SELECT n_users,
      |  CASE WHEN vx_ss > 0.0e0 THEN cov_ss / vx_ss END AS theta,
      |  CASE WHEN vx_ss > 0.0e0 AND vy_ss > 0.0e0
      |    THEN cov_ss * cov_ss / (vx_ss * vy_ss) END AS var_reduction
      |FROM f""".stripMargin

  /** Difference-in-differences (Card & Krueger 1994 shape) — the
    * experimentation-plane companion to [[evalCuped]]: users are
    * assigned to treatment/control by a salted md5 coin (bit-identical
    * across engines), the pre/post boundary is the same min-day+15
    * convention CUPED uses, and the estimator is the classic
    * two-by-two contrast of cell means
    * (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre).
    *
    * Determinism: each cell mean is ONE decimal-exact sum cast to
    * double divided by the cell count (Exact.davg), and the estimate
    * is three IEEE subtractions in a fixed order.
    *
    * Scale: one narrow map (hash + day flag) and ONE hash aggregation
    * to 4 cells — map-side combinable, no join, no window.
    */
  def evalDid(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      .select(col("user_id"), col("value"),
        (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"),
        pmod(conv(substr(md5(concat(lit("did:"),
          col("user_id").cast("string"))), lit(1), lit(8)), 16, 10)
          .cast("long"), lit(2L)).as("treat"))
    val d0 = ev.agg(min(col("day")).as("d0"))
    def cell(t: Int, post: Boolean, c: Column): Column = {
      val in = col("treat") === t &&
        (if (post) !(col("day") < col("d0") + 15L)
         else col("day") < col("d0") + 15L)
      when(in, c)
    }
    ev.crossJoin(broadcast(d0))
      .agg(
        count(cell(0, post = false, col("value"))).as("n_c_pre"),
        count(cell(0, post = true, col("value"))).as("n_c_post"),
        count(cell(1, post = false, col("value"))).as("n_t_pre"),
        count(cell(1, post = true, col("value"))).as("n_t_post"),
        Exact.davg(cell(0, post = false, col("value"))).as("m_c_pre"),
        Exact.davg(cell(0, post = true, col("value"))).as("m_c_post"),
        Exact.davg(cell(1, post = false, col("value"))).as("m_t_pre"),
        Exact.davg(cell(1, post = true, col("value"))).as("m_t_post"))
      .select(col("n_c_pre"), col("n_c_post"), col("n_t_pre"), col("n_t_post"),
        col("m_c_pre"), col("m_c_post"), col("m_t_pre"), col("m_t_post"),
        ((col("m_t_post") - col("m_t_pre")) -
          (col("m_c_post") - col("m_c_pre"))).as("did"))
  }

  val evalDidSql: String = {
    def avg(t: Int, postCmp: String): String =
      s"CAST(SUM(CASE WHEN treat = $t AND day $postCmp d0 + 15 " +
        s"THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) " +
        s"/ CAST(COUNT(CASE WHEN treat = $t AND day $postCmp d0 + 15 " +
        s"THEN value END) AS DOUBLE)"
    def n(t: Int, postCmp: String): String =
      s"CAST(COUNT(CASE WHEN treat = $t AND day $postCmp d0 + 15 " +
        s"THEN value END) AS BIGINT)"
    s"""WITH ev AS (SELECT value, epoch_ms(ts) // 86400000 AS day,
       |    CAST(CAST(concat('0x', substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) % 2 AS BIGINT) AS treat
       |  FROM events WHERE value IS NOT NULL),
       |d0 AS (SELECT MIN(day) AS d0 FROM ev),
       |cells AS (SELECT
       |    ${n(0, "<")} AS n_c_pre, ${n(0, ">=")} AS n_c_post,
       |    ${n(1, "<")} AS n_t_pre, ${n(1, ">=")} AS n_t_post,
       |    ${avg(0, "<")} AS m_c_pre, ${avg(0, ">=")} AS m_c_post,
       |    ${avg(1, "<")} AS m_t_pre, ${avg(1, ">=")} AS m_t_post
       |  FROM ev CROSS JOIN d0)
       |SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
       |  m_c_pre, m_c_post, m_t_pre, m_t_post,
       |  (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did
       |FROM cells""".stripMargin
  }

  /** Sample-ratio-mismatch check (Fabijan et al. 2019) on the SAME
    * salted md5 coin [[evalDid]] assigns with — the experiment-health
    * gate run before any effect estimate is trusted. Unit = user (one
    * assignment per user_id, not per event), expected split 50/50;
    * reported: per-arm unit counts, the normal-approximation z
    * statistic (n_t − n/2)/√(n/4), and the χ² statistic
    * (n_t − n_c)²/n — both a fixed 3-op double chain over exact
    * integer counts (√ is correctly-rounded IEEE, so cross-engine
    * bit-identical; no transcendentals).
    *
    * Scale: one distinct-user aggregation (map-side combinable) then
    * a 1-row fold — no join, no window.
    */
  def evalSrm(s: SparkSession, dir: String): DataFrame = {
    val users = Tables(s, dir, "events")
      .select(col("user_id")).distinct()
      .select(pmod(conv(substr(md5(concat(lit("did:"),
        col("user_id").cast("string"))), lit(1), lit(8)), 16, 10)
        .cast("long"), lit(2L)).as("treat"))
    users.agg(
        sum(when(col("treat") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("treat") === 1, 1L).otherwise(0L)).as("n_t"))
      .select(col("n_c"), col("n_t"),
        ((col("n_t").cast("double") -
          (col("n_c") + col("n_t")).cast("double") / lit(2.0)) /
          sqrt((col("n_c") + col("n_t")).cast("double") / lit(4.0))).as("z"),
        (((col("n_t") - col("n_c")) * (col("n_t") - col("n_c"))).cast("double") /
          (col("n_c") + col("n_t")).cast("double")).as("chisq"))
  }

  val evalSrmSql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |a AS (SELECT CAST(CAST(concat('0x', substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 2 AS BIGINT) AS treat FROM u),
      |c AS (SELECT CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
      |    CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t
      |  FROM a)
      |SELECT n_c, n_t,
      |  (CAST(n_t AS DOUBLE) - CAST(n_c + n_t AS DOUBLE) / 2.0e0)
      |    / sqrt(CAST(n_c + n_t AS DOUBLE) / 4.0e0) AS z,
      |  CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE)
      |    / CAST(n_c + n_t AS DOUBLE) AS chisq
      |FROM c""".stripMargin

  /** Pre-experiment power analysis: the minimum detectable effect
    * (MDE) per event_type at α = 0.05 (two-sided), power = 0.8, for
    * the two-sample mean test the [[evalDid]]/[[evalSrm]] assignment
    * would run — MDE = (z_{α/2} + z_β) · σ · √(1/n_c + 1/n_t), the
    * third leg of the experimentation plane (design, next to health
    * and estimate). The normal quantiles are transcendental, so the
    * SUM z_{0.025} + z_{0.2} is baked as ONE shortest-repr literal
    * (2.801585) into both plans — the eval_ndcg log-discount
    * convention; σ comes from decimal-exact moments (CUPED's
    * (18,2)/(38,4) scales) with a single correctly-rounded sqrt, and
    * the arm sizes come from the same salted coin.
    *
    * Scale: ONE hash aggregation over events (map-side combinable)
    * — no join, no window.
    */
  def evalPower(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        pmod(conv(substr(md5(concat(lit("did:"),
          col("user_id").cast("string"))), lit(1), lit(8)), 16, 10)
          .cast("long"), lit(2L)).as("treat"))
    ev.groupBy(col("event_type"))
      .agg(
        sum(when(col("treat") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("treat") === 1, 1L).otherwise(0L)).as("n_t"),
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sx"),
        sum((col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("decimal(38,4)"))
          .cast("double").as("sxx"))
      .withColumn("mean", col("sx") / col("n").cast("double"))
      // degenerate-group guards (ANSI divide-by-zero, edge corpus):
      // n = 1 → no variance; an empty arm → no MDE; mean 0 → no
      // relative MDE — all emitted as NULL, mirrored in the oracle
      .withColumn("variance", when(col("n") > 1,
        (col("n").cast("double") * col("sxx") - col("sx") * col("sx")) /
          (col("n").cast("double") * (col("n").cast("double") - lit(1.0)))))
      .withColumn("sd", sqrt(col("variance")))
      .withColumn("mde_abs", when(col("n_c") > 0 && col("n_t") > 0,
        lit(2.801585) * col("sd") *
          sqrt(lit(1.0) / col("n_c").cast("double") +
            lit(1.0) / col("n_t").cast("double"))))
      .select(col("event_type"), col("n_c"), col("n_t"), col("mean"),
        col("sd"), col("mde_abs"),
        when(col("mean") =!= 0.0, col("mde_abs") / col("mean")).as("mde_rel"))
      .orderBy(col("event_type"))
  }

  val evalPowerSql: String =
    """WITH ev AS (SELECT event_type, value,
      |    CAST(CAST(concat('0x', substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 2 AS BIGINT) AS treat
      |  FROM events WHERE value IS NOT NULL),
      |m AS (SELECT event_type,
      |    CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
      |    CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2))
      |      * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx
      |  FROM ev GROUP BY 1),
      |v AS (SELECT *, sx / CAST(n AS DOUBLE) AS mean,
      |    CASE WHEN n > 1 THEN (CAST(n AS DOUBLE) * sxx - sx * sx)
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)) END AS variance
      |  FROM m),
      |d AS (SELECT *, sqrt(variance) AS sd FROM v),
      |e AS (SELECT *, CASE WHEN n_c > 0 AND n_t > 0 THEN 2.801585e0 * sd
      |    * sqrt(1.0e0 / CAST(n_c AS DOUBLE) + 1.0e0 / CAST(n_t AS DOUBLE))
      |    END AS mde_abs FROM d)
      |SELECT event_type, n_c, n_t, mean, sd, mde_abs,
      |  CASE WHEN mean <> 0.0e0 THEN mde_abs / mean END AS mde_rel
      |FROM e ORDER BY event_type""".stripMargin

  /** Fisher's exact test (1935), one-sided upper tail, on the
    * per-nation 2×2 table (mktsegment = BUILDING) × (acctbal > 5000)
    * over customers — the small-sample independence test a z-test
    * misleads on. P(X ≥ a) under Hypergeometric(N, K, n), computed
    * without factorials: pmf(0) = Π (N−K−i)/(N−i), then the
    * ascending-k recurrence pmf(k+1) = pmf(k)·(K−k)(n−k) /
    * ((k+1)(N−K−n+k+1)) accumulated into the tail — every step one
    * exact int product and one double divide in a fixed order, so the
    * oracle replays the chain bit-for-bit.
    *
    * Validity domain: the recurrence starts at k=0, i.e. it assumes
    * n + K ≤ N (true by construction here — the two margins are
    * ~20%/~45% minorities); outside it the guarded chain still runs
    * identically on both engines (robustness, not inference). Scale:
    * one customer-scan groupBy; the per-nation fold is bounded by the
    * margin min(n, K), never the corpus.
    */
  def statsFisher(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("x"),
        when(col("c_acctbal") > 5000.0, 1L).otherwise(0L).as("y"))
    val tab = c.groupBy(col("n_name"))
      .agg(count(lit(1)).as("nn"), sum(col("x")).as("kk"),
        sum(col("y")).as("n1"), sum(col("x") * col("y")).as("a"))
    val hi = least(col("n1"), col("kk"))
    tab
      .withColumn("p0", when(col("n1") > 0,
        aggregate(sequence(lit(0L), col("n1") - 1), lit(1.0), (acc, i) =>
          acc * ((col("nn") - col("kk") - i).cast("double") /
            (col("nn") - i).cast("double")))).otherwise(lit(1.0)))
      .withColumn("p_value", when(hi > 0,
        aggregate(sequence(lit(0L), hi - 1),
          struct(col("p0").as("cur"),
            (when(col("a") <= 0, col("p0")).otherwise(lit(0.0))).as("tail")),
          (acc, k) => {
            val den = (k + 1) * (col("nn") - col("kk") - col("n1") + k + 1)
            val nxt = when(den > 0,
              acc.getField("cur") *
                (((col("kk") - k) * (col("n1") - k)).cast("double") /
                  den.cast("double"))).otherwise(lit(0.0))
            struct(nxt.as("cur"),
              (acc.getField("tail") +
                when(k + 1 >= col("a"), nxt).otherwise(lit(0.0))).as("tail"))
          }).getField("tail"))
        .otherwise(when(col("a") <= 0, col("p0")).otherwise(lit(0.0))))
      .select(col("n_name").as("nation"), col("nn").as("n_total"),
        col("kk").as("k_building"), col("n1").as("n_highbal"),
        col("a").as("a_both"), col("p_value"))
      .orderBy(col("nation"))
  }

  val statsFisherSql: String =
    """WITH c AS (SELECT n.n_name,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS x,
      |    CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END AS y
      |  FROM customer JOIN nation n ON c_nationkey = n.n_nationkey),
      |tab AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS nn,
      |    CAST(SUM(x) AS BIGINT) AS kk, CAST(SUM(y) AS BIGINT) AS n1,
      |    CAST(SUM(x * y) AS BIGINT) AS a
      |  FROM c GROUP BY 1),
      |p0 AS (SELECT *, CASE WHEN n1 > 0 THEN
      |    list_reduce(list_prepend(1.0e0, list_transform(range(n1),
      |      i -> CAST(nn - kk - i AS DOUBLE) / CAST(nn - i AS DOUBLE))),
      |      (acc, t) -> acc * t)
      |    ELSE 1.0e0 END AS p0
      |  FROM tab),
      |pv AS (SELECT *, CASE WHEN least(n1, kk) > 0 THEN
      |    list_reduce(list_prepend(
      |      {'tail': CASE WHEN a <= 0 THEN p0 ELSE 0.0e0 END, 'cur': p0, 'k': CAST(-1 AS BIGINT)},
      |      list_transform(range(least(n1, kk)),
      |        k -> {'tail': 0.0e0, 'cur': 0.0e0, 'k': k})),
      |      (acc, x2) -> {'tail': acc.tail + CASE WHEN x2.k + 1 >= a THEN
      |            (CASE WHEN (x2.k + 1) * (nn - kk - n1 + x2.k + 1) > 0
      |              THEN acc.cur * (CAST((kk - x2.k) * (n1 - x2.k) AS DOUBLE)
      |                / CAST((x2.k + 1) * (nn - kk - n1 + x2.k + 1) AS DOUBLE))
      |              ELSE 0.0e0 END)
      |          ELSE 0.0e0 END,
      |        'cur': CASE WHEN (x2.k + 1) * (nn - kk - n1 + x2.k + 1) > 0
      |          THEN acc.cur * (CAST((kk - x2.k) * (n1 - x2.k) AS DOUBLE)
      |            / CAST((x2.k + 1) * (nn - kk - n1 + x2.k + 1) AS DOUBLE))
      |          ELSE 0.0e0 END,
      |        'k': x2.k}).tail
      |    ELSE CASE WHEN a <= 0 THEN p0 ELSE 0.0e0 END END AS p_value
      |  FROM p0)
      |SELECT n_name AS nation, nn AS n_total, kk AS k_building,
      |  n1 AS n_highbal, a AS a_both, p_value
      |FROM pv ORDER BY nation""".stripMargin

  /** Benjamini–Hochberg FDR control (1995) at α = 0.1 over the
    * per-nation Fisher exact p-values — the multiple-testing step a
    * metrics platform runs after any per-segment test battery. Rank
    * the m p-values ascending (nation tiebreak), reject ranks
    * 1..k* where k* = max{i : p(i) ≤ α·i/m}, and report the standard
    * step-up adjusted p-value min_{j≥i}(p(j)·m/j) capped at 1.
    *
    * Determinism: p-values come from the already-certified exact
    * hypergeometric chain; BH adds only rank integers, one fixed
    * (p·m)/i chain and a running MIN — selection, not arithmetic.
    * The ranking window is unpartitioned but bounded by the nation
    * alphabet (≤25 rows — the documented bounded-window precedent).
    */
  def statsFdr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the Fisher exact-p subplan ONCE: the two crossJoins
    // below (f × f.agg, adj × adj.agg) would otherwise re-evaluate the
    // whole hypergeometric chain over customer up to 4×. Output is
    // alphabet-bounded (≤25 rows) so the checkpoint is a few KB.
    val f = statsFisher(s, dir).select(col("nation"), col("p_value"))
      .localCheckpoint(true)
    val ranked = f.crossJoin(f.agg(count(lit(1)).as("m")))
      .withColumn("i",
        row_number().over(Window.orderBy(col("p_value"), col("nation"))).cast("long"))
      .withColumn("raw",
        col("p_value") * col("m").cast("double") / col("i").cast("double"))
      .withColumn("pass",
        col("p_value") <= lit(0.1) * col("i").cast("double") / col("m").cast("double"))
    val adj = ranked.withColumn("p_adj", least(lit(1.0),
      min(col("raw")).over(Window.orderBy(col("i").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    adj.crossJoin(adj.agg(max(when(col("pass"), col("i"))).as("kstar")))
      .select(col("nation"), col("p_value"), col("i").as("bh_rank"), col("m"),
        col("p_adj"),
        (col("kstar").isNotNull && col("i") <= col("kstar")).cast("int").as("reject"))
      .orderBy(col("bh_rank"))
  }

  val statsFdrSql: String =
    s"""WITH fish AS ($statsFisherSql),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM fish),
       |rk AS (SELECT nation, p_value, CAST(ROW_NUMBER() OVER (
       |    ORDER BY p_value, nation) AS BIGINT) AS i FROM fish),
       |raw AS (SELECT r.nation, r.p_value, r.i, mm.m,
       |    r.p_value * CAST(mm.m AS DOUBLE) / CAST(r.i AS DOUBLE) AS raw,
       |    r.p_value <= 0.1e0 * CAST(r.i AS DOUBLE) / CAST(mm.m AS DOUBLE) AS pass
       |  FROM rk r CROSS JOIN mm),
       |adj AS (SELECT *, least(1.0e0, MIN(raw) OVER (ORDER BY i DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_adj FROM raw),
       |ks AS (SELECT MAX(CASE WHEN pass THEN i END) AS kstar FROM adj)
       |SELECT nation, p_value, i AS bh_rank, m, p_adj,
       |  CAST(CASE WHEN kstar IS NOT NULL AND i <= kstar THEN 1 ELSE 0 END
       |    AS INT) AS reject
       |FROM adj CROSS JOIN ks ORDER BY bh_rank""".stripMargin

  /** TOST equivalence test (Schuirmann 1987): two one-sided Welch
    * z-tests of click-vs-view mean value against the ±1.0 margin —
    * the "are these two variants the SAME?" question a plain t-test
    * cannot answer. Reuses the exact decimal moment chain of
    * stats_ttest verbatim; the only additions are the two shifted
    * z statistics and a literal-1.645 (α = .05 normal critical)
    * decision — no Φ evaluation, so the chain stays transcendental-
    * free. equivalent = 1 iff BOTH one-sided tests reject.
    */
  def statsTost(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.Exact.Dec
    val per = Tables(s, dir, "events")
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "view"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Dec)).cast("double").as("sx"),
        sum((col("value").cast(Dec) * col("value").cast(Dec))
          .cast("decimal(18,4)")).cast("double").as("sxx"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("m", col("sx") / col("nd"))
      .withColumn("v", when(col("n") >= 2,
        (col("sxx") - col("sx") * col("m")) / (col("nd") - lit(1.0))))
    val row = per.groupBy()
      .agg(
        max(when(col("event_type") === "click", col("n"))).as("n1"),
        max(when(col("event_type") === "click", col("m"))).as("m1"),
        max(when(col("event_type") === "click", col("v"))).as("v1"),
        max(when(col("event_type") === "view", col("n"))).as("n2"),
        max(when(col("event_type") === "view", col("m"))).as("m2"),
        max(when(col("event_type") === "view", col("v"))).as("v2"))
      .withColumn("se", sqrt(col("v1") / col("n1").cast("double") +
        col("v2") / col("n2").cast("double")))
      .withColumn("diff", col("m1") - col("m2"))
      .withColumn("z_low", (col("diff") + lit(1.0)) / col("se"))
      .withColumn("z_high", (lit(1.0) - col("diff")) / col("se"))
    row.select(col("n1"), col("n2"), col("m1"), col("m2"), col("diff"),
      col("se"), col("z_low"), col("z_high"),
      (col("z_low") > lit(1.645) && col("z_high") > lit(1.645))
        .cast("int").as("equivalent"))
  }

  val statsTostSql: String =
    """WITH per AS (SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
      |      AS DECIMAL(18,4))) AS DOUBLE) AS sxx
      |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')
      |  GROUP BY event_type),
      |mv AS (SELECT event_type, n, sx / CAST(n AS DOUBLE) AS m,
      |    CASE WHEN n >= 2 THEN (sxx - sx * (sx / CAST(n AS DOUBLE)))
      |      / (CAST(n AS DOUBLE) - 1.0e0) END AS v
      |  FROM per),
      |r AS (SELECT
      |    MAX(CASE WHEN event_type = 'click' THEN n END) AS n1,
      |    MAX(CASE WHEN event_type = 'click' THEN m END) AS m1,
      |    MAX(CASE WHEN event_type = 'click' THEN v END) AS v1,
      |    MAX(CASE WHEN event_type = 'view' THEN n END) AS n2,
      |    MAX(CASE WHEN event_type = 'view' THEN m END) AS m2,
      |    MAX(CASE WHEN event_type = 'view' THEN v END) AS v2
      |  FROM mv),
      |z AS (SELECT *, sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
      |    AS se, m1 - m2 AS diff FROM r)
      |SELECT n1, n2, m1, m2, diff, se,
      |  (diff + 1.0e0) / se AS z_low, (1.0e0 - diff) / se AS z_high,
      |  CAST(CASE WHEN (diff + 1.0e0) / se > 1.645e0
      |    AND (1.0e0 - diff) / se > 1.645e0 THEN 1 ELSE 0 END AS INT)
      |    AS equivalent
      |FROM z""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_fisher" -> (statsFisher _),
    "stats_fdr" -> (statsFdr _),
    "stats_tost" -> (statsTost _),
    "stats_prop_ztest" -> (statsPropZtest _),
    "eval_cuped" -> (evalCuped _),
    "eval_did" -> (evalDid _),
    "eval_srm" -> (evalSrm _),
    "eval_power" -> (evalPower _),
    "stats_hurst" -> (statsHurst _),
    "ts_pacf" -> (tsPacf _),
    "ts_ljungbox" -> (tsLjungbox _),
    "stats_cohens_d" -> (statsCohensD _),
    "stats_cramers_v" -> (statsCramersV _),
    "stats_mannwhitney" -> (statsMannwhitney _),
    "stats_levene" -> (statsLevene _),
    "stats_jarque_bera" -> (statsJarqueBera _))

  val oracles: Map[String, String] = Map(
    "stats_prop_ztest" -> statsPropZtestSql,
    "stats_fisher" -> statsFisherSql,
    "stats_fdr" -> statsFdrSql,
    "stats_tost" -> statsTostSql,
    "eval_cuped" -> evalCupedSql,
    "eval_did" -> evalDidSql,
    "eval_srm" -> evalSrmSql,
    "eval_power" -> evalPowerSql,
    "ts_pacf" -> tsPacfSql,
    "stats_hurst" -> statsHurstSql,
    "ts_ljungbox" -> tsLjungboxSql,
    "stats_cohens_d" -> statsCohensDSql,
    "stats_cramers_v" -> statsCramersVSql,
    "stats_mannwhitney" -> statsMannwhitneySql,
    "stats_levene" -> statsLeveneSql,
    "stats_jarque_bera" -> statsJarqueBeraSql)
}
