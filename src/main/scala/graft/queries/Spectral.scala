package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Single-frequency periodogram at the weekly period — "how much
  * 7-day cycle does each event stream carry?", the spectral
  * counterpart of `ts_seasonal`'s weekday profile (Schuster 1898
  * periodogram, one Goertzel bin).
  *
  * Determinism: cos/sin(2πk/7) are computed ONCE in Scala, rounded
  * to integer micro-units, and pasted as the same 7-element literal
  * tables into BOTH plans (the eval_ndcg discount convention — no
  * transcendental ever runs in either engine). Daily counts are
  * integers, so A/B accumulate as exact Σ cnt·weight LONGs; only the
  * final power chain divides to double. The DC component is not
  * removed — the raw bin value, documented; spans that are whole
  * weeks cancel it exactly.
  *
  * Scale: one keyed (type, day) count + one keyed reduction per
  * type — two map-side-combinable aggregations, no window, no sort.
  */
object Spectral {

  private val CosQ: IndexedSeq[Long] =
    (0 to 6).map(k => math.round(math.cos(2.0 * math.Pi * k / 7.0) * 1e6))
  private val SinQ: IndexedSeq[Long] =
    (0 to 6).map(k => math.round(math.sin(2.0 * math.Pi * k / 7.0) * 1e6))

  def periodogram(s: SparkSession, dir: String): DataFrame = {
    val cosLit = array(CosQ.map(lit): _*)
    val sinLit = array(SinQ.map(lit): _*)
    val daily = Tables(s, dir, "events")
      .select(col("event_type"),
        (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
    daily
      .withColumn("w", (col("day") % 7).cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("cnt") * element_at(cosLit, col("w") + 1)).as("a_micro"),
        sum(col("cnt") * element_at(sinLit, col("w") + 1)).as("b_micro"))
      .withColumn("a", col("a_micro").cast("double") / lit(1000000.0))
      .withColumn("b", col("b_micro").cast("double") / lit(1000000.0))
      .withColumn("power_weekly", col("a") * col("a") + col("b") * col("b"))
      .select(col("event_type"), col("n_days"), col("a_micro"), col("b_micro"),
        col("power_weekly"))
      .orderBy(col("event_type"))
  }

  val periodogramSql: String = {
    val cq = CosQ.mkString("[", ", ", "]")
    val sq = SinQ.mkString("[", ", ", "]")
    s"""WITH daily AS (SELECT event_type,
       |    CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |w AS (SELECT event_type, cnt, CAST(day % 7 AS INT) AS w FROM daily),
       |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(cnt * ($cq)[w + 1]) AS BIGINT) AS a_micro,
       |    CAST(SUM(cnt * ($sq)[w + 1]) AS BIGINT) AS b_micro
       |  FROM w GROUP BY 1),
       |d AS (SELECT *, CAST(a_micro AS DOUBLE) / 1000000.0e0 AS a,
       |    CAST(b_micro AS DOUBLE) / 1000000.0e0 AS b FROM agg)
       |SELECT event_type, n_days, a_micro, b_micro,
       |  a * a + b * b AS power_weekly
       |FROM d ORDER BY event_type""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_periodogram" -> (periodogram _))

  val oracles: Map[String, String] = Map(
    "ts_periodogram" -> periodogramSql)
}
