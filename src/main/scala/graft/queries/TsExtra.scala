package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 financial-style series diagnostics over the events table:
  * maximum drawdown from the running peak of the daily-total series,
  * and Wilder's RSI (1978) over the daily-close series.
  *
  * Determinism: daily totals/closes are exact integer micro-units
  * (round(value·10⁶)); drawdown stays integer to the final ratio;
  * RSI's Wilder recursion is a per-type ordered fold whose two state
  * slots each read ONLY their own previous value, so DuckDB's
  * sequential struct-accumulator semantics and a functional fold
  * agree (the ts_cusum hazard, designed around).
  */
object TsExtra {

  private def mv(c: Column): Column = round(c * 1000000.0).cast("long")

  /** Maximum drawdown per event type: daily totals (exact micro
    * units), running peak over days, dd = peak − today; reports the
    * worst dd with its day (earliest on ties), the peak it fell
    * from, and the fractional drop. Keyed windows only — partitions
    * are bounded by days-per-type, never corpus size.
    */
  def drawdown(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(mv(col("value")).cast("decimal(38,0)")).cast("long").as("dv"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("pk", max(col("dv")).over(w))
      .withColumn("dd", col("pk") - col("dv"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        min(struct((-col("dd")).as("negdd"), col("day"), col("pk").as("p"),
          col("dv").as("v"))).as("b"))
      .select(col("event_type"), col("n_days"),
        (-col("b.negdd")).as("max_dd"), col("b.day").as("dd_day"),
        col("b.p").as("peak_at"), col("b.v").as("level_at"),
        when(col("b.p") > 0,
          (-col("b.negdd")).cast("double") / col("b.p").cast("double"))
          .as("dd_frac"))
      .orderBy(col("event_type"))
  }

  val drawdownSql: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(round(value * 1000000.0e0) AS BIGINT)
      |      AS DECIMAL(38,0))) AS BIGINT) AS dv
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |dd AS (SELECT event_type, day, dv,
      |    MAX(dv) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
      |  FROM daily),
      |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    MIN(struct_pack(negdd := -(pk - dv), day := day, p := pk,
      |      v := dv)) AS b
      |  FROM dd GROUP BY 1)
      |SELECT event_type, n_days, -(b.negdd) AS max_dd, b.day AS dd_day,
      |  b.p AS peak_at, b.v AS level_at,
      |  CASE WHEN b.p > 0 THEN CAST(-(b.negdd) AS DOUBLE)
      |    / CAST(b.p AS DOUBLE) END AS dd_frac
      |FROM agg ORDER BY event_type""".stripMargin

  /** Wilder's RSI (14) on the per-type daily close (last event of
    * the day by (ts, event_id) — a deterministic selection). Seed =
    * plain mean of the first 14 gains/losses (exact integer sum, one
    * division); then the Wilder recursion g ← (13g + gain)/14 folded
    * in day order. rs = g/l, RSI = 100 − 100/(1+rs); an all-gain
    * series (l = 0) pegs RSI at 100 by convention.
    */
  def rsi(s: SparkSession, dir: String): DataFrame = {
    val closes = Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(max(struct(col("ts"), col("event_id"),
        mv(col("value")).as("m"))).getField("m").as("close"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val diffs = closes
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        struct(col("day"), greatest(col("close") - col("prev"), lit(0L)).as("g"),
          greatest(col("prev") - col("close"), lit(0L)).as("l")).as("x"))
    diffs.groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("x"))).as("arr"))
      .filter(size(col("arr")) >= 14)
      .withColumn("g0",
        aggregate(slice(col("arr"), 1, 14), lit(0L), (a, x) => a + x.getField("g"))
          .cast("double") / 14.0)
      .withColumn("l0",
        aggregate(slice(col("arr"), 1, 14), lit(0L), (a, x) => a + x.getField("l"))
          .cast("double") / 14.0)
      .withColumn("st", aggregate(
        slice(col("arr"), lit(15), size(col("arr")) - 14),
        struct(col("g0").as("g"), col("l0").as("l")),
        (acc, x) => struct(
          ((acc.getField("g") * 13.0 + x.getField("g").cast("double")) / 14.0)
            .as("g"),
          ((acc.getField("l") * 13.0 + x.getField("l").cast("double")) / 14.0)
            .as("l"))))
      .select(col("event_type"), size(col("arr")).cast("long").as("n_diffs"),
        col("st.g").as("avg_gain"), col("st.l").as("avg_loss"),
        when(col("st.l") === 0.0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) /
            (lit(1.0) + col("st.g") / col("st.l"))).as("rsi"))
      .orderBy(col("event_type"))
  }

  val rsiSql: String =
    """WITH closes AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    MAX(struct_pack(ts := ts, eid := event_id,
      |      m := CAST(round(value * 1000000.0e0) AS BIGINT))).m AS close
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |diffs AS (SELECT event_type, day,
      |    close - LAG(close) OVER (PARTITION BY event_type ORDER BY day) AS d
      |  FROM closes),
      |arrs AS (SELECT event_type,
      |    list(struct_pack(day := day,
      |      g := CAST(greatest(d, 0) AS BIGINT),
      |      l := CAST(greatest(-d, 0) AS BIGINT)) ORDER BY day) AS arr
      |  FROM diffs WHERE d IS NOT NULL GROUP BY 1),
      |seed AS (SELECT event_type, arr,
      |    CAST(list_sum(list_transform(arr[1:14], x -> x.g)) AS DOUBLE)
      |      / 14.0e0 AS g0,
      |    CAST(list_sum(list_transform(arr[1:14], x -> x.l)) AS DOUBLE)
      |      / 14.0e0 AS l0
      |  FROM arrs WHERE len(arr) >= 14),
      |st AS (SELECT event_type, CAST(len(arr) AS BIGINT) AS n_diffs,
      |    list_reduce(list_prepend({'g': g0, 'l': l0},
      |      list_transform(arr[15:], x -> {'g': CAST(x.g AS DOUBLE),
      |                                     'l': CAST(x.l AS DOUBLE)})),
      |      (acc, x) -> {'g': (acc.g * 13.0e0 + x.g) / 14.0e0,
      |                   'l': (acc.l * 13.0e0 + x.l) / 14.0e0})
      |      AS w
      |  FROM seed)
      |SELECT event_type, n_diffs, w.g AS avg_gain, w.l AS avg_loss,
      |  CASE WHEN w.l = 0.0e0 THEN 100.0e0
      |    ELSE 100.0e0 - 100.0e0 / (1.0e0 + w.g / w.l) END AS rsi
      |FROM st ORDER BY event_type""".stripMargin

  /** MASE — mean absolute SCALED error (Hyndman & Koehler 2006), the
    * scale-free forecast-accuracy measure a backtest plane reports
    * when MAPE breaks on zero-crossing series: the seasonal-naive
    * forecast's MAE divided by the one-step-naive MAE, per event
    * type. MASE < 1 ⇔ the weekly-seasonal model beats the random
    * walk. The weekly forecast is CALENDAR-based (the value observed
    * exactly 7 days earlier, via a day−7 equi-join — r9 ADVICE: a
    * row-based lag(dv, 7) silently compares against a non-weekly
    * offset whenever the day grid has gaps); the one-step naive stays
    * the previous OBSERVATION (Hyndman's in-sample scaler is defined
    * on consecutive observations of the series as recorded).
    *
    * Determinism: daily totals are exact integer micro-units; both
    * absolute-error sums stay INTEGER (order-free), each MAE is one
    * division, the ratio one more; series too short for a lag (or a
    * constant series with zero naive error) emit NULL, never a
    * divide-by-zero.
    *
    * Scale: ONE corpus aggregation to the (type, day) table — tiny
    * (types × day-span) and checkpointed so the weekly self-join
    * consumes it without a second corpus scan; the join side is
    * broadcast, the one-step lag is a keyed window over day-span-
    * bounded partitions, then one final per-type aggregation.
    */
  def mase(s: SparkSession, dir: String): DataFrame = {
    val daily = graft.Caches.checkpointReset(
      Tables(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(mv(col("value")).cast("decimal(38,0)")).cast("long").as("dv"))
        .coalesce(1))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val weekAgo = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("dv").as("l7"))
    val lagged = daily
      .withColumn("l1", lag(col("dv"), 1).over(w))
      .join(broadcast(weekAgo), Seq("event_type", "day"), "left")
    lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        count(col("l7")).as("n7"), count(col("l1")).as("n1"),
        sum(when(col("l7").isNotNull,
          abs(col("dv") - col("l7")).cast("decimal(38,0)"))).cast("long")
          .as("sae7"),
        sum(when(col("l1").isNotNull,
          abs(col("dv") - col("l1")).cast("decimal(38,0)"))).cast("long")
          .as("sae1"))
      .withColumn("mae7", when(col("n7") > 0,
        col("sae7").cast("double") / col("n7").cast("double")))
      .withColumn("mae1", when(col("n1") > 0,
        col("sae1").cast("double") / col("n1").cast("double")))
      .withColumn("mase", when(col("mae1").isNotNull && col("mae1") > 0.0,
        col("mae7") / col("mae1")))
      .orderBy(col("event_type"))
  }

  val maseSql: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(round(value * 1000000.0e0) AS BIGINT)
      |      AS DECIMAL(38,0))) AS BIGINT) AS dv
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |l1s AS (SELECT event_type, day, dv,
      |    lag(dv, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1
      |  FROM daily),
      |lagged AS (SELECT d.event_type, d.dv, p.dv AS l7, d.l1
      |  FROM l1s d LEFT JOIN daily p
      |    ON p.event_type = d.event_type AND p.day = d.day - 7),
      |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(COUNT(l7) AS BIGINT) AS n7, CAST(COUNT(l1) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN l7 IS NOT NULL
      |      THEN CAST(abs(dv - l7) AS HUGEINT) END) AS BIGINT) AS sae7,
      |    CAST(SUM(CASE WHEN l1 IS NOT NULL
      |      THEN CAST(abs(dv - l1) AS HUGEINT) END) AS BIGINT) AS sae1
      |  FROM lagged GROUP BY 1),
      |mm AS (SELECT *,
      |    CASE WHEN n7 > 0 THEN CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE) END AS mae7,
      |    CASE WHEN n1 > 0 THEN CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS mae1
      |  FROM agg)
      |SELECT event_type, n_days, n7, n1, sae7, sae1, mae7, mae1,
      |  CASE WHEN mae1 IS NOT NULL AND mae1 > 0.0e0 THEN mae7 / mae1 END AS mase
      |FROM mm ORDER BY event_type""".stripMargin

  /** Bollinger bands (Bollinger 1980s; the rolling mean ± 2σ channel)
    * over the per-type daily-total series, 20-observation window:
    * reports per type how often the series pierced the upper/lower
    * band and the final day's band values — the volatility-regime
    * summary a monitoring plane keeps next to ts_ewma/ts_rsi.
    *
    * Determinism: each window's Σx (micro-units, BIGINT) and Σx²
    * (DECIMAL(38,0)) are EXACT rolling sums — order-free — and the
    * mean/σ chain per row is fixed IEEE (population σ, one
    * correctly-rounded sqrt); breaches are strict > / < compares of
    * bit-identical doubles; rows before a full 20-obs window are
    * excluded by an integer count. Breach counts are integers.
    *
    * Scale: one corpus aggregation to (type, day), two rolling
    * windows over day-span-bounded partitions, one per-type roll-up.
    */
  def bollinger(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(mv(col("value")).cast("decimal(38,0)")).cast("long").as("dv"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-19, Window.currentRow)
    val rolled = daily
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("sx", sum(col("dv")).over(w))
      .withColumn("sxx",
        sum((col("dv").cast("decimal(38,0)") * col("dv"))
          .cast("decimal(38,0)")).over(w))
      .filter(col("k") === 20)
      .withColumn("mean", col("sx").cast("double") / lit(20.0))
      .withColumn("sigma", sqrt(
        col("sxx").cast("double") / lit(20.0) - col("mean") * col("mean")))
      .withColumn("upper", col("mean") + lit(2.0) * col("sigma"))
      .withColumn("lower", col("mean") - lit(2.0) * col("sigma"))
    rolled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_windows"),
        sum((col("dv").cast("double") > col("upper")).cast("long")).as("n_breach_up"),
        sum((col("dv").cast("double") < col("lower")).cast("long")).as("n_breach_down"),
        max(struct(col("day"), col("mean"), col("sigma"),
          col("upper"), col("lower"))).as("last"))
      .select(col("event_type"), col("n_windows"), col("n_breach_up"),
        col("n_breach_down"), col("last.day").cast("string").as("last_day"),
        col("last.mean").as("last_mean"), col("last.sigma").as("last_sigma"),
        col("last.upper").as("last_upper"), col("last.lower").as("last_lower"))
      .orderBy(col("event_type"))
  }

  val bollingerSql: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(round(value * 1000000.0e0) AS BIGINT)
      |      AS DECIMAL(38,0))) AS BIGINT) AS dv
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |rolled AS (SELECT event_type, day, dv,
      |    COUNT(*) OVER w AS k,
      |    CAST(SUM(dv) OVER w AS BIGINT) AS sx,
      |    CAST(SUM(CAST(dv AS HUGEINT) * dv) OVER w AS HUGEINT) AS sxx
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      |bands AS (SELECT event_type, day, dv,
      |    CAST(sx AS DOUBLE) / 20.0e0 AS mean,
      |    sqrt(CAST(sxx AS DOUBLE) / 20.0e0
      |      - (CAST(sx AS DOUBLE) / 20.0e0) * (CAST(sx AS DOUBLE) / 20.0e0))
      |      AS sigma
      |  FROM rolled WHERE k = 20),
      |bb AS (SELECT *, mean + 2.0e0 * sigma AS upper,
      |    mean - 2.0e0 * sigma AS lower FROM bands),
      |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_windows,
      |    CAST(SUM(CASE WHEN CAST(dv AS DOUBLE) > upper THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_breach_up,
      |    CAST(SUM(CASE WHEN CAST(dv AS DOUBLE) < lower THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_breach_down,
      |    MAX(struct_pack(day := day, mean := mean, sigma := sigma,
      |      upper := upper, lower := lower)) AS last
      |  FROM bb GROUP BY 1)
      |SELECT event_type, n_windows, n_breach_up, n_breach_down,
      |  CAST(last.day AS VARCHAR) AS last_day, last.mean AS last_mean,
      |  last.sigma AS last_sigma, last.upper AS last_upper,
      |  last.lower AS last_lower
      |FROM agg ORDER BY event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_drawdown" -> (drawdown _),
    "ts_rsi" -> (rsi _),
    "ts_mase" -> (mase _),
    "ts_bollinger" -> (bollinger _))

  val oracles: Map[String, String] = Map(
    "ts_drawdown" -> drawdownSql,
    "ts_rsi" -> rsiSql,
    "ts_mase" -> maseSql,
    "ts_bollinger" -> bollingerSql)
}
