package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "survival_km" -> (kaplanMeier _))

  val oracles: Map[String, String] = Map(
    "survival_km" -> kaplanMeierSql)
}
