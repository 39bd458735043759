package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window-based time-series operators (SURVEY §2.9; reference
  * `utilities/timeseries/`). All single-pass window functions over the
  * series partition key — one shuffle on (series), then narrow.
  */
object TimeSeriesOps {

  /** Series-ordered window: partition by series, order by time with a
    * unique tie-breaker (parallel scans make ties real).
    */
  def seriesWindow(series: Column, order: Seq[Column]): WindowSpec =
    Window.partitionBy(series).orderBy(order: _*)

  /** T1 backfill: blank label ← last non-blank above (merged-cell
    * semantics, extractSpreadsheet.py:104-120).
    */
  def backfill(c: Column, w: WindowSpec): Column =
    last(c, ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** T4 value imputation (ts_converter.py:102-163): forward-fill, and the
    * leading gap back-fills from the first following value.
    */
  def impute(c: Column, w: WindowSpec): Column =
    coalesce(
      last(c, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      first(c, ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))

  /** A4 numeric-share gate (ts_converter.py:117-163, threshold 0.8):
    * fraction of parsable-numeric values decides impute vs stringify.
    */
  def numericShare(c: Column): Column =
    (count(when(c.try_cast("double").isNotNull, 1)).cast("double") /
      count(lit(1)).cast("double"))

  /** T2 inline-metadata series splitting (extractSpreadsheet.py:161-186):
    * sub-series id increments whenever the metadata column changes.
    * Null-safe comparison: inside a run of null metadata, `=!=` yields
    * null while `lag.isNull` stays true — the old formulation started a
    * NEW sub-series on every consecutive null row instead of keeping
    * the run together.
    */
  def splitOnChange(meta: Column, w: WindowSpec): Column =
    sum(when(meta <=> lag(meta, 1).over(w), 0).otherwise(1))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** T3 date-diff x-axis (trend/io_utils.py:15-48): fractional "years"
    * since series start using the reference's 365-day approximation.
    */
  def yearsSinceStart(tsMs: Column, w: WindowSpec): Column = {
    val startMs = min(tsMs).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    (tsMs - startMs).cast("double") / lit(365.0 * 86400000.0)
  }

  /** T5 anomaly (spike) detection (trend/linear_fit.py:111-146): point
    * whose distance to BOTH neighbors exceeds `frac` of the series range
    * with a sign flip of adjacent deltas.
    */
  def isSpike(v: Column, w: WindowSpec, frac: Double = 0.4): Column = {
    val fullW = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val range = max(v).over(fullW) - min(v).over(fullW)
    val dPrev = v - lag(v, 1).over(w)
    val dNext = lead(v, 1).over(w) - v
    dPrev.isNotNull && dNext.isNotNull &&
      abs(dPrev) > lit(frac) * range && abs(dNext) > lit(frac) * range &&
      (dPrev * dNext) < 0
  }

  /** T9 slope description (trend/linear_fit.py:9-17,178-189): bucketize
    * the scaled slope into the reference's 7 labels.
    */
  val SlopeThresholds: Seq[Double] = Seq(-2, -0.5, -0.05, 0.05, 0.5, 2)
  val SlopeLabels: Seq[String] = Seq(
    "decreasing - quickly", "decreasing", "decreasing - slowly", "constant",
    "increasing - slowly", "increasing", "increasing - quickly")

  def slopeDescription(scaledSlope: Column): Column =
    SlopeThresholds.zip(SlopeLabels).foldRight(lit(SlopeLabels.last): Column) {
      case ((t, l), acc) => when(scaledSlope < t, lit(l)).otherwise(acc)
    }

  /** Sequential-fold sums over a sorted per-series point list — the
    * cross-engine-deterministic way to aggregate ugly doubles (Spark
    * `aggregate` ≡ DuckDB `list_reduce`, both left-to-right IEEE).
    */
  def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** OLS slope over (xs, ys) arrays via sequential-fold sums:
    * slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²).
    */
  def olsSlope(xs: Column, ys: Column): Column = {
    val n = size(xs).cast("double")
    val sx = foldSum(xs)
    val sy = foldSum(ys)
    val sxy = foldSum(zip_with(xs, ys, (a, b) => a * b))
    val sxx = foldSum(zip_with(xs, xs, (a, b) => a * b))
    // guarded denominator (degenerate series: single point or all-equal
    // x): Spark yields NaN/Inf on /0 while DuckDB yields NULL — the
    // guard keeps both engines on the same finite value. Variance is
    // non-negative, so the guard only fires at exactly zero.
    (n * sxy - sx * sy) / greatest(n * sxx - sx * sx, lit(1e-12))
  }

  /** T14 label templating (ts_label_maker.py:12-44): format-string over
    * series metadata, missing keys → '' — the P9 template engine reused
    * on the series metadata frame.
    */
  def labelTemplate(target: String, pattern: String)
                   (df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.ingest.MappingRules.template(target, pattern)(df)

  /** A6 content-hash ids (ts_converter.py:30-33,58-61,79-89). */
  def seriesId(dataset: Column, name: Column): Column =
    upper(sha2(concat_ws("", dataset, name), 256))

  def measurementId(payload: Column, seriesId: Column): Column =
    sha2(concat(payload, seriesId), 256)
}
