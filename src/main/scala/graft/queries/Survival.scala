package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Survival analysis over the `events` stream — the Kaplan–Meier
  * product-limit estimator (Kaplan & Meier 1958) with the
  * Nelson–Aalen cumulative hazard alongside, the standard
  * time-to-conversion / retention curve a product-analytics plane
  * ships next to funnels and cohorts (beyond-reference; the
  * reference's KG/ETL scope has no survival operator).
  *
  * Subject = user; duration = whole hours from the user's first
  * event to their first `purchase`; users who never purchase are
  * right-censored at their last event. Subjects censored at
  * duration t remain in the risk set at t (censoring-after-events
  * tie convention, the standard estimator).
  *
  * Determinism: risk counts are exact integers; S(t) and H(t) are
  * left-to-right folds over durations in ascending order — factor
  * 1 − d_t/n_t and increment d_t/n_t are one int→double division
  * each. Durations with zero observed conversions multiply S by
  * exactly 1.0 and add exactly 0.0 to H (IEEE-exact no-ops), so the
  * oracle may fold over conversion rows only and still match
  * bit-for-bit — which lets it use a plain scalar-accumulator
  * `list_reduce` per row (DuckDB 1.0 drops list growth inside
  * struct accumulators, so the Spark side's single-pass
  * struct-accumulator fold has no faithful SQL twin; the value
  * chain is identical either way).
  *
  * Scale: two keyed aggregations (per-user lifetime, per-duration
  * counts) — both map-side-combinable — then ONE driver-sized fold
  * over the distinct-duration list, bounded by the observation span
  * in hours, not the corpus. No global sort, no unpartitioned
  * window, no collect.
  */
object Survival {

  /** KM survival + Nelson–Aalen hazard at each duration with ≥1
    * observed conversion: t_hours, n_risk, n_events, surv, cumhaz.
    */
  def kaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
    val ue = ev.groupBy(col("user_id"))
      .agg(min(col("ts_ms")).as("t0"), max(col("ts_ms")).as("t1"),
        min(when(col("event_type") === "purchase", col("ts_ms"))).as("fp"))
    val usr = ue.select(
      expr("(coalesce(fp, t1) - t0) div 3600000").as("d"),
      when(col("fp").isNotNull, 1L).otherwise(0L).as("conv"))
    val cnt = usr.groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("ev"))
    val one = cnt.agg(sum(col("n")).as("total"),
      sort_array(collect_list(struct(col("d"), col("n"), col("ev")))).as("xs"))
    val outT = "array<struct<t:bigint,risk:bigint,ev:bigint,surv:double,cumhaz:double>>"
    val folded = one.select(aggregate(col("xs"),
      struct(array().cast(outT).as("out"), lit(1.0).as("prod"),
        lit(0.0).as("na"), col("total").as("rem")),
      (acc, x) => {
        val rem = acc.getField("rem")
        val ratio = x.getField("ev").cast("double") / rem.cast("double")
        val prod2 = acc.getField("prod") * (lit(1.0) - ratio)
        val na2 = acc.getField("na") + ratio
        struct(
          when(x.getField("ev") > 0,
            concat(acc.getField("out"), array(struct(
              x.getField("d").as("t"), rem.as("risk"),
              x.getField("ev").as("ev"), prod2.as("surv"),
              na2.as("cumhaz")))))
            .otherwise(acc.getField("out")).as("out"),
          prod2.as("prod"), na2.as("na"),
          (rem - x.getField("n")).as("rem"))
      }).as("km"))
    folded.select(explode(col("km.out")).as("r"))
      .select(col("r.t").as("t_hours"), col("r.risk").as("n_risk"),
        col("r.ev").as("n_events"), col("r.surv").as("surv"),
        col("r.cumhaz").as("cumhaz"))
      .orderBy(col("t_hours"))
  }

  /** Oracle replay: risk sets from an integer window cumsum, then a
    * per-row scalar product/sum fold over conversion durations ≤ t
    * in ascending order — the identical IEEE chain (see scaladoc).
    */
  val kaplanMeierSql: String =
    """WITH ue AS (SELECT user_id, MIN(epoch_ms(ts)) AS t0, MAX(epoch_ms(ts)) AS t1,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS fp
      |  FROM events GROUP BY 1),
      |usr AS (SELECT (COALESCE(fp, t1) - t0) // 3600000 AS d,
      |    CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS conv
      |  FROM ue),
      |cnt AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(conv) AS BIGINT) AS ev FROM usr GROUP BY 1),
      |wk AS (SELECT d, n, ev,
      |    (SELECT CAST(SUM(n) AS BIGINT) FROM cnt)
      |      - CAST(COALESCE(SUM(n) OVER (ORDER BY d
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS risk
      |  FROM cnt),
      |lst AS (SELECT list(struct_pack(d := d, ev := ev, risk := risk)
      |    ORDER BY d) AS l
      |  FROM wk WHERE ev > 0)
      |SELECT d AS t_hours, risk AS n_risk, ev AS n_events,
      |  list_reduce(list_prepend(1.0e0,
      |    list_transform(list_filter(l, e -> e.d <= d),
      |      e -> 1.0e0 - CAST(e.ev AS DOUBLE) / CAST(e.risk AS DOUBLE))),
      |    (a, b) -> a * b) AS surv,
      |  list_reduce(list_prepend(0.0e0,
      |    list_transform(list_filter(l, e -> e.d <= d),
      |      e -> CAST(e.ev AS DOUBLE) / CAST(e.risk AS DOUBLE))),
      |    (a, b) -> a + b) AS cumhaz
      |FROM wk, lst WHERE ev > 0 ORDER BY t_hours""".stripMargin

  /** Two-group log-rank test (Mantel 1966; Peto & Peto 1972) over the
    * same time-to-purchase durations as [[kaplanMeier]], groups by
    * the experimentation plane's salted md5 coin ("lr:" salt) on
    * user_id — "does treatment change the conversion-time curve?",
    * the survival-plane companion of eval_cuped's mean contrast.
    *
    * At each duration d with observed conversions: d_j total events,
    * n_j total at risk, n_1j group-1 at risk, d_1j group-1 events;
    * O = Σ d_1j (exact integer), E = Σ d_j·n_1j/n_j and the
    * hypergeometric V = Σ d_j·(n_1j/n_j)·(1−n_1j/n_j)·(n_j−d_j)/(n_j−1)
    * as duration-ORDERED folds (each term is a fixed double chain off
    * exact integer counts; n_j = 1 terms contribute exactly 0.0 to V
    * by the same CASE on both engines); z = (O−E)/√V, χ² = z².
    *
    * Scale: one per-user aggregation, ONE per-duration hash
    * aggregation with group cells, risk sets from prefix windows over
    * the duration alphabet (bounded by the observation span in hours,
    * not the corpus), folds on that alphabet-sized list.
    */
  def logrank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
    val ue = ev.groupBy(col("user_id"))
      .agg(min(col("ts_ms")).as("t0"), max(col("ts_ms")).as("t1"),
        min(when(col("event_type") === "purchase", col("ts_ms"))).as("fp"))
    val usr = ue.select(
      expr("(coalesce(fp, t1) - t0) div 3600000").as("d"),
      when(col("fp").isNotNull, 1L).otherwise(0L).as("conv"),
      pmod(conv(substr(md5(concat(lit("lr:"),
        col("user_id").cast("string"))), lit(1), lit(8)), 16, 10)
        .cast("long"), lit(2L)).as("g"))
    def cell(g: Int, c: Column): Column = when(col("g") === g, c)
    val cnt = usr.groupBy(col("d"))
      .agg(count(cell(0, lit(1))).as("c0"), count(cell(1, lit(1))).as("c1"),
        // ELSE-0 (not bare when): a duration whose risk set is all one
        // group must yield event count 0, not NULL — a NULL here
        // silently DROPS the row from the E/V folds via dj > 0
        sum(cell(0, col("conv")).otherwise(0L)).as("e0"),
        sum(cell(1, col("conv")).otherwise(0L)).as("e1"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = cnt.agg(sum(col("c0")).as("t0"), sum(col("c1")).as("t1"))
    val risk = cnt.crossJoin(broadcast(tot))
      .withColumn("r0", col("t0") - coalesce(sum(col("c0")).over(w), lit(0L)))
      .withColumn("r1", col("t1") - coalesce(sum(col("c1")).over(w), lit(0L)))
      .withColumn("dj", col("e0") + col("e1"))
      .withColumn("nj", col("r0") + col("r1"))
      .filter(col("dj") > 0)
      .withColumn("e_term",
        col("dj").cast("double") * col("r1").cast("double") /
          col("nj").cast("double"))
      .withColumn("v_term", when(col("nj") > 1,
        col("dj").cast("double") *
          (col("r1").cast("double") / col("nj").cast("double")) *
          (lit(1.0) - col("r1").cast("double") / col("nj").cast("double")) *
          ((col("nj").cast("double") - col("dj").cast("double")) /
            (col("nj").cast("double") - lit(1.0)))).otherwise(lit(0.0)))
    val folded = risk.agg(
        max(col("t0")).as("n_control"), max(col("t1")).as("n_treat"),
        sum(col("e1")).as("o1"),
        sort_array(collect_list(struct(col("d"), col("e_term"), col("v_term"))))
          .as("l"))
      .select(col("n_control"), col("n_treat"), col("o1"),
        aggregate(transform(col("l"), x => x.getField("e_term")),
          lit(0.0), (a, b) => a + b).as("e1"),
        aggregate(transform(col("l"), x => x.getField("v_term")),
          lit(0.0), (a, b) => a + b).as("v"))
    folded
      .withColumn("z", when(col("v") > 0.0,
        (col("o1").cast("double") - col("e1")) / sqrt(col("v"))))
      .withColumn("chi2", col("z") * col("z"))
  }

  val logrankSql: String =
    """WITH ue AS (SELECT user_id, MIN(epoch_ms(ts)) AS t0, MAX(epoch_ms(ts)) AS t1,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS fp
      |  FROM events GROUP BY 1),
      |usr AS (SELECT (COALESCE(fp, t1) - t0) // 3600000 AS d,
      |    CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS conv,
      |    CAST(CAST(concat('0x', substr(md5('lr:' || CAST(user_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 2 AS BIGINT) AS g
      |  FROM ue),
      |cnt AS (SELECT d,
      |    CAST(COUNT(CASE WHEN g = 0 THEN 1 END) AS BIGINT) AS c0,
      |    CAST(COUNT(CASE WHEN g = 1 THEN 1 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN g = 0 THEN conv ELSE 0 END) AS BIGINT) AS e0,
      |    CAST(SUM(CASE WHEN g = 1 THEN conv ELSE 0 END) AS BIGINT) AS e1
      |  FROM usr GROUP BY 1),
      |tt AS (SELECT CAST(SUM(c0) AS BIGINT) AS t0,
      |    CAST(SUM(c1) AS BIGINT) AS t1 FROM cnt),
      |risk AS (SELECT d, e0, e1,
      |    tt.t0 - CAST(COALESCE(SUM(c0) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS r0,
      |    tt.t1 - CAST(COALESCE(SUM(c1) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS r1,
      |    tt.t0, tt.t1
      |  FROM cnt CROSS JOIN tt),
      |terms AS (SELECT d, e1, t0, t1,
      |    CAST(e0 + e1 AS DOUBLE) * CAST(r1 AS DOUBLE)
      |      / CAST(r0 + r1 AS DOUBLE) AS e_term,
      |    CASE WHEN r0 + r1 > 1 THEN
      |      CAST(e0 + e1 AS DOUBLE)
      |        * (CAST(r1 AS DOUBLE) / CAST(r0 + r1 AS DOUBLE))
      |        * (1.0e0 - CAST(r1 AS DOUBLE) / CAST(r0 + r1 AS DOUBLE))
      |        * ((CAST(r0 + r1 AS DOUBLE) - CAST(e0 + e1 AS DOUBLE))
      |          / (CAST(r0 + r1 AS DOUBLE) - 1.0e0))
      |      ELSE 0.0e0 END AS v_term
      |  FROM risk WHERE e0 + e1 > 0),
      |f AS (SELECT MAX(t0) AS n_control, MAX(t1) AS n_treat,
      |    CAST(SUM(e1) AS BIGINT) AS o1,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(e_term ORDER BY d)), (a, b) -> a + b) AS e1,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(v_term ORDER BY d)), (a, b) -> a + b) AS v
      |  FROM terms),
      |z AS (SELECT *, CASE WHEN v > 0.0e0
      |    THEN (CAST(o1 AS DOUBLE) - e1) / sqrt(v) END AS z FROM f)
      |SELECT n_control, n_treat, o1, e1, v, z, z * z AS chi2 FROM z""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "survival_km" -> (kaplanMeier _),
    "survival_logrank" -> (logrank _))

  val oracles: Map[String, String] = Map(
    "survival_km" -> kaplanMeierSql,
    "survival_logrank" -> logrankSql)
}
