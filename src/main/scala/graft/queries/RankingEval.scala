package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ranking-quality metrics for the retrieval plane — the offline eval
  * suite a search/recommendation team runs against a judged corpus:
  * nDCG@10, MRR@10 and MAP@10 per query. Here each user is a "query",
  * the ranked list is that user's events by value (ties broken by
  * event_id — a total order), and relevance is binary
  * (event_type = 'purchase'); the same operators apply unchanged to a
  * (query, doc, score, label) judgment table. Completes the model-eval
  * family ([[FeatureQueries]]'s AUC/confusion/calibration/lift) on the
  * ranking side.
  *
  * Determinism: the log2 discount table is computed ONCE in Scala and
  * embedded as shortest-repr double literals in BOTH the Spark plan and
  * the oracle SQL (`0.63...e0` — the e0 suffix defeats DuckDB's
  * decimal-literal default), so no transcendental is ever evaluated by
  * either engine; per-user folds run left-to-right in rank order
  * (`aggregate` ≡ `list_reduce`) over ≤K elements. The MAP accumulator
  * struct orders its fields so no field reads an already-updated slot —
  * the ts_cusum DuckDB sequential-struct lesson.
  *
  * Scale: one keyed window per user (rank ≤ K prune immediately after),
  * then a per-user ≤K-element array fold — no global sort, no
  * unpartitioned window; output is one row per user.
  */
object RankingEval {

  private val K = 10

  /** 1/log2(i+1) for ranks i = 1..K, as plan-time constants. */
  private val Discounts: IndexedSeq[Double] =
    (1 to K).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  private def discountsLit: Column = array(Discounts.map(lit): _*)

  private def discountsSql: String =
    "[" + Discounts.map(d => s"${d}e0").mkString(", ") + "]"

  /** Per-user array of binary relevance flags in rank order (≤K),
    * ranked by value desc with event_id tiebreak. */
  private def rankedRels(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .withColumn("rel", (col("event_type") === "purchase").cast("long"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("rn"), col("rel")))).as("rr"))
      .withColumn("rels", transform(col("rr"), x => x.getField("rel")))
      .withColumn("n_top", size(col("rels")).cast("long"))
      .withColumn("r10", aggregate(col("rels"), lit(0L), (a, b) => a + b))
  }

  /** Shared oracle CTE prefix: same ranked per-user rel arrays. */
  private val RelsCte: String =
    """r0 AS (SELECT user_id, event_id, value,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
      |  FROM events WHERE value IS NOT NULL),
      |r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY value DESC, event_id) AS rn FROM r0),
      |r2 AS (SELECT user_id,
      |    list_transform(list(struct_pack(rn := rn, rel := rel) ORDER BY rn),
      |      x -> CAST(x.rel AS BIGINT)) AS rels
      |  FROM r1 WHERE rn <= 10 GROUP BY user_id),
      |r3 AS (SELECT user_id, rels, CAST(len(rels) AS BIGINT) AS n_top,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), rels),
      |      (a, b) -> a + b) AS BIGINT) AS r10 FROM r2)""".stripMargin

  /** nDCG@10 per user: DCG from the literal discount table zipped with
    * the rel flags (ordered fold), IDCG from the first r10 discounts. */
  def evalNdcg(s: SparkSession, dir: String): DataFrame =
    rankedRels(s, dir)
      .withColumn("dcg", aggregate(
        zip_with(col("rels"), slice(discountsLit, 1, K),
          (r, d) => r.cast("double") * d),
        lit(0.0), (a, b) => a + b))
      .withColumn("idcg", aggregate(
        slice(discountsLit, lit(1), col("r10").cast("int")), lit(0.0), (a, b) => a + b))
      .select(col("user_id"), col("n_top"), col("r10"), col("dcg"),
        when(col("r10") > 0L, col("dcg") / col("idcg")).as("ndcg"))
      .orderBy(col("user_id"))

  val evalNdcgSql: String =
    s"""WITH $RelsCte,
       |d AS (SELECT *, $discountsSql AS disc FROM r3),
       |c AS (SELECT user_id, n_top, r10,
       |    CAST(list_reduce(list_prepend(0.0e0,
       |      list_transform(list_zip(rels, disc[1:len(rels)]),
       |        x -> CAST(x[1] AS DOUBLE) * x[2])), (a, b) -> a + b) AS DOUBLE) AS dcg,
       |    CAST(list_reduce(list_prepend(0.0e0, disc[1:r10]),
       |      (a, b) -> a + b) AS DOUBLE) AS idcg
       |  FROM d)
       |SELECT user_id, n_top, r10, dcg,
       |  CASE WHEN r10 > 0 THEN dcg / idcg END AS ndcg
       |FROM c ORDER BY user_id""".stripMargin

  /** MRR@10 per user: reciprocal rank of the first relevant item —
    * a rank selection plus one correctly-rounded division. */
  def evalMrr(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .withColumn("rel", (col("event_type") === "purchase").cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_top"),
        min(when(col("rel") === 1L, col("rn"))).as("first_rel"))
      .select(col("user_id"), col("n_top"), col("first_rel"),
        when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel").cast("double")).as("mrr"))
      .orderBy(col("user_id"))
  }

  val evalMrrSql: String =
    """WITH r0 AS (SELECT user_id, event_id, value,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
      |  FROM events WHERE value IS NOT NULL),
      |r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY value DESC, event_id) AS rn FROM r0),
      |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_top,
      |    CAST(MIN(CASE WHEN rel = 1 THEN rn END) AS BIGINT) AS first_rel
      |  FROM r1 WHERE rn <= 10 GROUP BY user_id)
      |SELECT user_id, n_top, first_rel,
      |  CASE WHEN first_rel IS NOT NULL
      |    THEN 1.0e0 / CAST(first_rel AS DOUBLE) END AS mrr
      |FROM a ORDER BY user_id""".stripMargin

  /** MAP@10 per user: average of precision-at-i over relevant
    * positions, via a left-to-right struct-accumulator fold (s before
    * c so DuckDB's sequential struct evaluation reads the pre-update
    * count — the ts_cusum field-order discipline). */
  def evalMap(s: SparkSession, dir: String): DataFrame =
    rankedRels(s, dir)
      // fold elements are pre-mapped into the ACCUMULATOR's struct type
      // (s := rank-as-double, c := rel) — DuckDB's list_reduce needs a
      // homogeneous list, so init and elements must share one shape
      // (the ts_cusum convention)
      .withColumn("acc", aggregate(
        zip_with(col("rels"), sequence(lit(1), size(col("rels"))),
          (r, i) => struct(i.cast("double").as("s"), r.as("c"))),
        struct(lit(0.0).as("s"), lit(0L).as("c")),
        (acc, x) => struct(
          (acc.getField("s") +
            x.getField("c").cast("double") *
              ((acc.getField("c") + x.getField("c")).cast("double") / x.getField("s")))
            .as("s"),
          (acc.getField("c") + x.getField("c")).as("c")))
      )
      .select(col("user_id"), col("n_top"), col("r10"),
        when(col("r10") > 0L,
          col("acc").getField("s") / col("r10").cast("double")).as("ap"))
      .orderBy(col("user_id"))

  val evalMapSql: String =
    s"""WITH $RelsCte,
       |z AS (SELECT user_id, n_top, r10,
       |    list_transform(list_zip(rels, range(1, len(rels) + 1)),
       |      x -> struct_pack(s := CAST(x[2] AS DOUBLE), c := x[1])) AS es FROM r3),
       |f AS (SELECT user_id, n_top, r10,
       |    list_reduce(list_prepend(struct_pack(s := 0.0e0, c := CAST(0 AS BIGINT)), es),
       |      (acc, x) -> struct_pack(
       |        s := acc.s + CAST(x.c AS DOUBLE) *
       |          (CAST(acc.c + x.c AS DOUBLE) / x.s),
       |        c := acc.c + x.c)) AS acc
       |  FROM z)
       |SELECT user_id, n_top, r10,
       |  CASE WHEN r10 > 0 THEN acc.s / CAST(r10 AS DOUBLE) END AS ap
       |FROM f ORDER BY user_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_ndcg" -> (evalNdcg _),
    "eval_mrr" -> (evalMrr _),
    "eval_map" -> (evalMap _))

  val oracles: Map[String, String] = Map(
    "eval_ndcg" -> evalNdcgSql,
    "eval_mrr" -> evalMrrSql,
    "eval_map" -> evalMapSql)
}
