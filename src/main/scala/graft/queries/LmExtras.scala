package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Round-8 language-model estimation extras: interpolated Kneser–Ney
  * bigram probabilities (Kneser & Ney 1995; Chen & Goodman 1998 §2.7)
  * — the smoothing the bigram-LM/perplexity pair (text_bigram_lm,
  * text_perplexity) deliberately skipped, and the standard n-gram LM
  * baseline a training-data pipeline scores corpora with.
  *
  * Determinism: every ingredient is an integer count (bigram count,
  * left-context total, distinct successors/predecessors, distinct
  * bigram types); P_KN is a fixed four-ratio IEEE chain with the
  * absolute discount 0.75 as an exact double literal. No top-k
  * cutoff — the output is every bigram with count ≥ 30, so no
  * ordering-by-double hazard exists.
  */
object LmExtras {

  /** Interpolated KN: P(w2|w1) = max(c−d,0)/c(w1) +
    * d·N₁₊(w1·)/c(w1) · N₁₊(·w2)/N₁₊(··), d = 0.75. Emitted for
    * bigrams with c ≥ 30 (statistics still use the FULL corpus).
    *
    * Scale: one explode into (w1,w2) pairs, one hash aggregation,
    * two keyed re-aggregations (per-w1, per-w2) joined back on their
    * keys, one scalar cross join for the type total — all
    * map-side-combinable; no window, no sort.
    */
  def kneserNey(s: SparkSession, dir: String): DataFrame = {
    val t = TextFunctions.tokens(col("text"))
    val bg = Tables(s, dir, "documents")
      .select(t.as("t"))
      .select(explode(when(size(col("t")) >= 2,
        transform(sequence(lit(1), size(col("t")) - 1), i =>
          struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val cbg = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val left = cbg.groupBy(col("w1"))
      .agg(sum(col("c")).as("c1"), count(lit(1)).as("nsucc"))
    val right = cbg.groupBy(col("w2")).agg(count(lit(1)).as("nprec"))
    val types = cbg.agg(count(lit(1)).as("ntypes"))
    cbg.filter(col("c") >= 30)
      .join(left, "w1").join(right, "w2").crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c"), col("c1"),
        col("nsucc"), col("nprec"), col("ntypes"),
        (greatest(col("c").cast("double") - 0.75, lit(0.0)) /
          col("c1").cast("double") +
          (lit(0.75) * col("nsucc").cast("double") / col("c1").cast("double")) *
            (col("nprec").cast("double") / col("ntypes").cast("double")))
          .as("p_kn"))
      .orderBy(col("w1"), col("w2"))
  }

  val kneserNeySql: String =
    """WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM documents),
      |bg AS (SELECT t[i+1] AS w1, t[i+2] AS w2
      |  FROM (SELECT t, unnest(range(greatest(len(t) - 1, 0))) AS i FROM toks)),
      |cbg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM bg GROUP BY 1, 2),
      |lft AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
      |    CAST(COUNT(*) AS BIGINT) AS nsucc FROM cbg GROUP BY 1),
      |rgt AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nprec FROM cbg GROUP BY 1),
      |tys AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntypes FROM cbg)
      |SELECT b.w1, b.w2, b.c, l.c1, l.nsucc, r.nprec, t.ntypes,
      |  greatest(CAST(b.c AS DOUBLE) - 0.75e0, 0.0e0) / CAST(l.c1 AS DOUBLE)
      |    + (0.75e0 * CAST(l.nsucc AS DOUBLE) / CAST(l.c1 AS DOUBLE))
      |      * (CAST(r.nprec AS DOUBLE) / CAST(t.ntypes AS DOUBLE)) AS p_kn
      |FROM cbg b JOIN lft l USING (w1) JOIN rgt r USING (w2) CROSS JOIN tys t
      |WHERE b.c >= 30
      |ORDER BY b.w1, b.w2""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_kneser_ney" -> (kneserNey _))

  val oracles: Map[String, String] = Map(
    "text_kneser_ney" -> kneserNeySql)
}
