package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Curation-gate fairness audit over the documents corpus — the bias
  * report a training-data pipeline runs before shipping a filtered
  * corpus (Barocas & Selbst 2016's disparate-impact framing; the
  * 4/5ths rule ratio): does the gate keep documents at equal rates
  * across sources, and does it find the wanted class equally well?
  *
  * Gate = "document length ≥ the EXACT corpus lower median of
  * n_chars" (rank selection off the two-level cumulative — the
  * eval_qte convention, no float boundary); wanted class = English
  * documents; protected attribute = source. Per source: selection
  * rate, TPR (equal opportunity), FPR; pooled on every row: the
  * demographic-parity difference (max − min selection rate), the
  * disparate-impact ratio (min/max — the 4/5ths-rule number), and
  * the equal-opportunity difference.
  *
  * Determinism: all cells are exact integer counts; every rate is
  * one division of integers; the pooled max/min run over per-group
  * DOUBLES but max/min are order-free, so no fold is needed. Groups
  * with an empty class emit NULL rates and drop out of the pooled
  * extremes on both engines (max/min ignore NULLs).
  *
  * Scale: the median via [[FeatureQueries.cumRanks]] (1024-bucket
  * two-level cumulative — no global sort), then ONE corpus
  * aggregation to |sources| rows; pooled extremes on that alphabet.
  */
object Fairness {

  def report(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("source"), col("n_chars"),
        (col("lang") === "en").cast("long").as("truth"))
    val vals = docs.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("c"))
    val med = FeatureQueries.cumRanks(vals)
      .filter(col("cum") >= expr("(n - 1) div 2") + 1L)
      .agg(min(col("v")).as("med"))
    val cells = docs.crossJoin(broadcast(med))
      .withColumn("pred", (col("n_chars") >= col("med")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("pred")).as("n_sel"),
        sum(col("pred") * col("truth")).as("tp"),
        sum((lit(1L) - col("pred")) * col("truth")).as("fn"),
        sum(col("pred") * (lit(1L) - col("truth"))).as("fp"),
        sum((lit(1L) - col("pred")) * (lit(1L) - col("truth"))).as("tn"))
      .withColumn("sel_rate", col("n_sel").cast("double") / col("n").cast("double"))
      .withColumn("tpr", when(col("tp") + col("fn") > 0,
        col("tp").cast("double") / (col("tp") + col("fn")).cast("double")))
      .withColumn("fpr", when(col("fp") + col("tn") > 0,
        col("fp").cast("double") / (col("fp") + col("tn")).cast("double")))
    val pooled = cells.agg(
        max(col("sel_rate")).as("max_sel"), min(col("sel_rate")).as("min_sel"),
        max(col("tpr")).as("max_tpr"), min(col("tpr")).as("min_tpr"))
      .select(
        (col("max_sel") - col("min_sel")).as("dp_diff"),
        when(col("max_sel") > 0.0, col("min_sel") / col("max_sel")).as("di_ratio"),
        (col("max_tpr") - col("min_tpr")).as("eo_diff"))
    cells.crossJoin(broadcast(pooled))
      .select(col("source"), col("n"), col("n_sel"), col("tp"), col("fn"),
        col("fp"), col("tn"), col("sel_rate"), col("tpr"), col("fpr"),
        col("dp_diff"), col("di_ratio"), col("eo_diff"))
      .orderBy(col("source"))
  }

  val reportSql: String =
    """WITH docs AS (SELECT source, n_chars,
      |    CAST(lang = 'en' AS BIGINT) AS truth FROM documents),
      |vals AS (SELECT n_chars AS v, COUNT(*) AS c FROM docs GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vals),
      |cm AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, nn.n
      |  FROM vals CROSS JOIN nn),
      |med AS (SELECT MIN(v) AS med FROM cm WHERE cum >= (n - 1) // 2 + 1),
      |cells AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pred) AS BIGINT) AS n_sel,
      |    CAST(SUM(pred * truth) AS BIGINT) AS tp,
      |    CAST(SUM((1 - pred) * truth) AS BIGINT) AS fn,
      |    CAST(SUM(pred * (1 - truth)) AS BIGINT) AS fp,
      |    CAST(SUM((1 - pred) * (1 - truth)) AS BIGINT) AS tn
      |  FROM (SELECT source, truth,
      |      CAST(n_chars >= med AS BIGINT) AS pred
      |    FROM docs CROSS JOIN med) GROUP BY 1),
      |rates AS (SELECT *,
      |    CAST(n_sel AS DOUBLE) / CAST(n AS DOUBLE) AS sel_rate,
      |    CASE WHEN tp + fn > 0
      |      THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS tpr,
      |    CASE WHEN fp + tn > 0
      |      THEN CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE) END AS fpr
      |  FROM cells),
      |pooled AS (SELECT MAX(sel_rate) AS max_sel, MIN(sel_rate) AS min_sel,
      |    MAX(tpr) AS max_tpr, MIN(tpr) AS min_tpr FROM rates),
      |pb AS (SELECT max_sel - min_sel AS dp_diff,
      |    CASE WHEN max_sel > 0.0e0 THEN min_sel / max_sel END AS di_ratio,
      |    max_tpr - min_tpr AS eo_diff FROM pooled)
      |SELECT r.source, r.n, r.n_sel, r.tp, r.fn, r.fp, r.tn,
      |  r.sel_rate, r.tpr, r.fpr, pb.dp_diff, pb.di_ratio, pb.eo_diff
      |FROM rates r CROSS JOIN pb ORDER BY r.source""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fairness_report" -> (report _))

  val oracles: Map[String, String] = Map(
    "fairness_report" -> reportSql)
}
