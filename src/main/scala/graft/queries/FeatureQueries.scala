package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Feature-engineering operators for a training-data pipeline: the
  * steps between "curated corpus" and "model-ready matrix" — wide
  * pivots, categorical target encoding, exact quantile binning and
  * winsorization. Beyond-reference scope (the reference delegates
  * feature prep to downstream consumers); grouped here so the family
  * reads as one suite.
  *
  * Determinism discipline (the suite-wide rule): no double is ever the
  * result of an unordered floating-point reduction. Counts are
  * integers; every emitted double is either an untouched input value
  * (selection), or a short fixed chain of IEEE ops (divide / multiply /
  * add) applied in the same order by Spark and DuckDB — bit-exact
  * without rounding.
  */
object FeatureQueries {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Wide per-user feature row via `groupBy().pivot()` with an EXPLICIT
    * value list — the relational crosstab operator. Explicit values
    * matter twice at scale: Spark skips the extra distinct-scan job it
    * otherwise runs to discover the pivot alphabet, and the output
    * schema is fixed at plan time (a drifting alphabet cannot widen the
    * row). One hash aggregate, one shuffle of (user, 5 counters).
    */
  def pivotEvents(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes
      .foldLeft(p)((df, t) =>
        df.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t))
      .orderBy(col("user_id"))
  }

  val pivotEventsSql: String = {
    val cols = EventTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n      |  ")
    s"""SELECT user_id,
      |  $cols
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** The inverse reshape: MELT the wide [[pivotEvents]] matrix back to
    * long (user, event_type, cnt) rows through Spark's native `unpivot`
    * (an Expand node — one pass, no join against a type table). The
    * oracle is the direct long-form aggregate, so the query certifies
    * pivot→unpivot as an exact roundtrip. Zero rows are kept (the
    * unpivot contract: the wide matrix is dense) — dropping them would
    * make the roundtrip lossy for absent (user, type) cells.
    */
  def reshapeUnpivot(s: SparkSession, dir: String): DataFrame =
    pivotEvents(s, dir)
      .unpivot(Array(col("user_id")),
        EventTypes.map(t => col(s"n_$t")).toArray, "event_type", "cnt")
      .withColumn("event_type", expr("substring(event_type, 3)"))
      .orderBy(col("user_id"), col("event_type"))

  val reshapeUnpivotSql: String = {
    val arms = EventTypes.map(t =>
      s"SELECT user_id, '$t' AS event_type, CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS cnt FROM events GROUP BY user_id")
      .mkString("\n      |UNION ALL ")
    s"""SELECT * FROM (
      |$arms)
      |ORDER BY user_id, event_type""".stripMargin
  }

  /** Smoothed target encoding (Micci-Barreca 2001): category →
    * (pos + m·prior) / (cnt + m) with m = 100, target = order status
    * 'F'. The high-cardinality-categorical workhorse. Everything up to
    * the final two divisions is integer counting (one keyed aggregate +
    * a broadcast global row); the encoding itself is a five-op IEEE
    * chain evaluated in the same order by both engines, so the doubles
    * hash exactly. At 100 TB the encoding table is dimension-sized and
    * broadcasts back onto the fact table for free.
    */
  def encodeTarget(s: SparkSession, dir: String): DataFrame = {
    val per = Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("pos"))
    val g = per.agg(sum(col("cnt")).as("g_n"), sum(col("pos")).as("g_pos"))
    per.crossJoin(broadcast(g))
      .withColumn("prior", col("g_pos").cast("double") / col("g_n").cast("double"))
      .withColumn("target_enc",
        (col("pos").cast("double") + lit(100.0) * col("prior")) /
          (col("cnt").cast("double") + lit(100.0)))
      .select(col("o_orderpriority"), col("cnt"), col("pos"),
        col("prior"), col("target_enc"))
      .orderBy(col("o_orderpriority"))
  }

  val encodeTargetSql: String =
    """WITH per AS (SELECT o_orderpriority, COUNT(*) AS cnt,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |  FROM orders GROUP BY 1),
      |g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS g_n,
      |    CAST(SUM(pos) AS BIGINT) AS g_pos FROM per)
      |SELECT o_orderpriority, cnt, pos,
      |  CAST(g_pos AS DOUBLE) / CAST(g_n AS DOUBLE) AS prior,
      |  (CAST(pos AS DOUBLE) + 100.0e0 * (CAST(g_pos AS DOUBLE) / CAST(g_n AS DOUBLE))) /
      |    (CAST(cnt AS DOUBLE) + 100.0e0) AS target_enc
      |FROM per CROSS JOIN g ORDER BY o_orderpriority""".stripMargin

  /** Exact cumulative rank per distinct value WITHOUT a global sort —
    * the stats_ks two-level shape: per-value counts → 1024 range
    * buckets → bucket offsets prefix-summed in a tiny window → a
    * bucket-KEYED running sum adds the within-bucket part. One keyed
    * shuffle plus a broadcast of 1024 offsets, the same plan at any
    * corpus size. Returns (v, c, cum, n) with integer cumulatives.
    */
  private[queries] def cumRanks(vals: DataFrame): DataFrame = {
    val rng = vals.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      sum(col("c")).as("n"))
    val bucketed = vals.crossJoin(broadcast(rng))
      .withColumn("bucket",
        least(floor((col("v") - col("lo")) * 1024.0 /
          greatest(col("hi") - col("lo"), lit(1e-300))).cast("long"), lit(1023L)))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("c")).as("sc"))
      .withColumn("off", coalesce(sum(col("sc")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off"))
    val wb = Window.partitionBy(col("bucket")).orderBy(col("v"))
    bucketed.join(broadcast(offsets), "bucket")
      .withColumn("cum", col("off") + sum(col("c")).over(wb))
      .select(col("v"), col("c"), col("cum"), col("n"))
  }

  /** Grouped [[cumRanks]]: exact cumulative rank per distinct value
    * WITHIN each group `g`, same two-level shape — per-(g,bucket)
    * offsets prefix-summed in a window over ≤1024 rows per group, the
    * within-bucket remainder in a (g,bucket)-keyed window. The offsets
    * table is |groups|·1024 rows (broadcastable for any bounded group
    * alphabet), so no per-group global sort exists at any corpus size.
    * Input (g, v, c) → output (g, v, c, cum, n) with n = group total.
    */
  private[queries] def cumRanksBy(vals: DataFrame): DataFrame = {
    val rng = vals.groupBy(col("g")).agg(min(col("v")).as("lo"),
      max(col("v")).as("hi"), sum(col("c")).as("n"))
    val bucketed = vals.join(broadcast(rng), "g")
      .withColumn("bucket",
        least(floor((col("v") - col("lo")) * 1024.0 /
          greatest(col("hi") - col("lo"), lit(1e-300))).cast("long"), lit(1023L)))
    val offsets = bucketed.groupBy(col("g"), col("bucket"))
      .agg(sum(col("c")).as("sc"))
      .withColumn("off", coalesce(sum(col("sc")).over(
        Window.partitionBy(col("g")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("g"), col("bucket"), col("off"))
    val wb = Window.partitionBy(col("g"), col("bucket")).orderBy(col("v"))
    // r12: preserve any EXTRA columns the caller attached to vals (after
    // g/v/c) — stats_spearman rides its per-cell srq moment through the
    // rank computation instead of joining the cell table back against
    // its own ranks (one full pass of the cell table saved). Callers
    // passing exactly (g, v, c) see the identical (g, v, c, cum, n).
    bucketed.join(broadcast(offsets), Seq("g", "bucket"))
      .withColumn("cum", col("off") + sum(col("c")).over(wb))
      .select(vals.columns.map(col) ++ Seq(col("cum"), col("n")): _*)
  }

  private def orderPriceCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_totalprice").as("v")).agg(count(lit(1)).as("c"))

  /** Exact equi-depth decile binning of order totals: bin(v) =
    * ((cum(v) − 1) · 10) div n — pure integer arithmetic on exact
    * cumulative ranks, so all copies of a value land in one bin and
    * bins are balanced to ±1 row when values are distinct. This is the
    * discretizer a feature pipeline wants (quantile bins, not
    * equi-width), computed exactly where most systems fall back to a
    * sketch. Emitted bin edges are untouched input doubles (selection).
    */
  def encodeBinning(s: SparkSession, dir: String): DataFrame =
    cumRanks(orderPriceCounts(s, dir))
      .withColumn("bin", expr("(cum - 1) * 10 div n"))
      .groupBy(col("bin"))
      .agg(sum(col("c")).as("cnt"),
        min(col("v")).as("lo_value"), max(col("v")).as("hi_value"))
      .orderBy(col("bin"))

  val encodeBinningSql: String =
    """WITH vals AS (SELECT o_totalprice AS v, COUNT(*) AS c FROM orders GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vals),
      |cm AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, nn.n
      |  FROM vals CROSS JOIN nn)
      |SELECT ((cum - 1) * 10) // n AS bin, CAST(SUM(c) AS BIGINT) AS cnt,
      |  MIN(v) AS lo_value, MAX(v) AS hi_value
      |FROM cm GROUP BY 1 ORDER BY bin""".stripMargin

  /** Winsorization at exact p05/p95: the boundary is the rank-SELECTED
    * order statistic (smallest v whose cumulative count reaches
    * floor(p·(n−1))+1 — the ts_percentiles selection convention on the
    * two-level cumulative, so no global sort), and every emitted value
    * is either an untouched input double or that selected boundary —
    * nothing to round. The clamp itself is least(greatest(v, lo), hi)
    * broadcast onto the rows; output restricted to o_orderkey ≤ 500 to
    * keep the certified slice readable.
    */
  def encodeWinsorize(s: SparkSession, dir: String): DataFrame = {
    val bounds = cumRanks(orderPriceCounts(s, dir))
      .agg(
        min(when(col("cum") >=
          floor(lit(0.05) * (col("n") - 1)).cast("long") + 1, col("v"))).as("lo"),
        min(when(col("cum") >=
          floor(lit(0.95) * (col("n") - 1)).cast("long") + 1, col("v"))).as("hi"))
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") <= 500)
      .crossJoin(broadcast(bounds))
      .select(col("o_orderkey"), col("o_totalprice"),
        least(greatest(col("o_totalprice"), col("lo")), col("hi")).as("winsorized"),
        when(col("o_totalprice") < col("lo"), "low")
          .when(col("o_totalprice") > col("hi"), "high")
          .otherwise("none").as("clipped"))
      .orderBy(col("o_orderkey"))
  }

  val encodeWinsorizeSql: String =
    """WITH vals AS (SELECT o_totalprice AS v, COUNT(*) AS c FROM orders GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vals),
      |cm AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, nn.n
      |  FROM vals CROSS JOIN nn),
      |b AS (SELECT
      |    MIN(CASE WHEN cum >= CAST(floor(0.05e0 * (n - 1)) AS BIGINT) + 1 THEN v END) AS lo,
      |    MIN(CASE WHEN cum >= CAST(floor(0.95e0 * (n - 1)) AS BIGINT) + 1 THEN v END) AS hi
      |  FROM cm)
      |SELECT o_orderkey, o_totalprice,
      |  least(greatest(o_totalprice, lo), hi) AS winsorized,
      |  CASE WHEN o_totalprice < lo THEN 'low'
      |       WHEN o_totalprice > hi THEN 'high' ELSE 'none' END AS clipped
      |FROM orders CROSS JOIN b WHERE o_orderkey <= 500
      |ORDER BY o_orderkey""".stripMargin

  /** RFM customer segmentation — recency (days since last order, so
    * quintile 0 = most recent), frequency (order count), monetary
    * (decimal-exact price sum, the [[Exact.dsum]] discipline) — each
    * dimension quintiled EXACTLY through the same two-level
    * cumulative-rank machinery as encode_binning, then joined back by
    * value. Classic mart-building operator; per-dimension rank tables
    * are value-distinct (far smaller than the customer table) and the
    * join-backs are value-keyed. The monetary join key is a double,
    * safe here because both engines produce it from the identical
    * decimal sum (bit-equal by construction).
    */
  def rfmScores(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .select(col("o_custkey"),
        // parquet ms timestamps read as TIMESTAMP_NTZ; session is
        // pinned UTC so the cast is shift-free and unix_millis applies
        (unix_millis(col("o_orderdate").cast("timestamp")) / lit(86400000L))
          .cast("long").as("day"),
        col("o_totalprice"))
    val maxd = o.agg(max(col("day")).as("maxd"))
    // r13: MATERIALIZED once — cust has FOUR consumers (three quintile
    // rank tables + the final join) and as a plain plan the orders
    // aggregation re-ran per consumer (profiled: four 150k-row scan
    // stages of 180-400 ms each, the query's dominant cost). The
    // checkpoint is the per-customer working set, one pass at any scale.
    val cust = o.groupBy(col("o_custkey"))
      .agg(max(col("day")).as("lastd"), count(lit(1)).as("f"),
        Exact.dsum(col("o_totalprice")).as("monetary"))
      .crossJoin(broadcast(maxd))
      .withColumn("r_days", col("maxd") - col("lastd"))
      .select(col("o_custkey"), col("r_days"), col("f"), col("monetary"))
      .localCheckpoint(true)
    def quintiles(dim: String): DataFrame =
      cumRanks(cust.groupBy(col(dim).as("v")).agg(count(lit(1)).as("c")))
        .withColumn("q", expr("(cum - 1) * 5 div n"))
        .select(col("v").as(dim), col("q"))
    cust
      .join(quintiles("r_days").withColumnRenamed("q", "r_q"), "r_days")
      .join(quintiles("f").withColumnRenamed("q", "f_q"), "f")
      .join(quintiles("monetary").withColumnRenamed("q", "m_q"), "monetary")
      .select(col("o_custkey").as("c_custkey"), col("r_days"), col("f"),
        col("monetary"), col("r_q"), col("f_q"), col("m_q"))
      .orderBy(col("c_custkey"))
  }

  val rfmScoresSql: String = {
    val quintile = (name: String, dim: String) =>
      s"""${name}v AS (SELECT $dim AS v, COUNT(*) AS c FROM cust GROUP BY 1),
        |${name}n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ${name}v),
        |${name}q AS (SELECT v,
        |    ((CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) - 1) * 5) // n AS q
        |  FROM ${name}v CROSS JOIN ${name}n)""".stripMargin
    s"""WITH o AS (SELECT o_custkey,
      |    CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day, o_totalprice
      |  FROM orders),
      |mx AS (SELECT MAX(day) AS maxd FROM o),
      |cust AS (SELECT o_custkey, maxd - MAX(day) AS r_days, COUNT(*) AS f,
      |    ${Exact.sqlSum("o_totalprice")} AS monetary
      |  FROM o CROSS JOIN mx GROUP BY o_custkey, maxd),
      |${quintile("r", "r_days")},
      |${quintile("f", "f")},
      |${quintile("m", "monetary")}
      |SELECT o_custkey AS c_custkey, cust.r_days, cust.f, cust.monetary,
      |  rq.q AS r_q, fq.q AS f_q, mq.q AS m_q
      |FROM cust JOIN rq ON rq.v = cust.r_days JOIN fq ON fq.v = cust.f
      |JOIN mq ON mq.v = cust.monetary
      |ORDER BY c_custkey""".stripMargin
  }

  /** Population Stability Index — the standard model-monitoring drift
    * score: order totals are split at the date-range midpoint into a
    * reference and a current period, the REFERENCE period's exact
    * decile boundaries (selection ranks over the two-level cumulative)
    * define 10 bins, and PSI = Σ (p−q)·ln(p/q) over bin shares. All
    * ten bins stay alive on both sides via a literal bin table, with
    * empty-bin counts floored to 1 FOR THE SHARE ONLY (the standard
    * ε-floor, raw counts reported) so ln never sees zero. Shares are
    * exact divisions; only the ln-bearing contributions and the PSI
    * fold (bin-ordered) are rounded to 4 decimals.
    */
  def dqPsi(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .select(col("o_totalprice").as("v"),
        (unix_millis(col("o_orderdate").cast("timestamp")) / lit(86400000L))
          .cast("long").as("day"))
    val mid = o.agg(expr("min(day) + (max(day) - min(day)) div 2").as("mid"))
    val tagged = o.crossJoin(broadcast(mid))
      .withColumn("period", when(col("day") < col("mid"), "ref").otherwise("cur"))
    val refCounts = tagged.filter(col("period") === "ref")
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val boundCols = (1 to 9).map(k =>
      min(when(col("cum") >=
        floor(lit(k / 10.0) * (col("n") - 1)).cast("long") + 1, col("v")))
        .as(s"b$k"))
    val bounds = cumRanks(refCounts).agg(boundCols.head, boundCols.tail: _*)
    // ≤20-row barrier: binned feeds totals + both period filters —
    // without it each consumer re-runs the full scan+bound+bin chain
    // (measured: 2.9s → 1.7s at sf0.1)
    val binned = tagged.crossJoin(broadcast(bounds))
      .withColumn("bin",
        (1 to 9).map(k => when(col("v") >= col(s"b$k"), 1L).otherwise(0L))
          .reduce(_ + _))
      .groupBy(col("period"), col("bin")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val totals = binned.groupBy(col("period")).agg(sum(col("cnt")).as("tot"))
    val bins = s.range(0, 10).select(col("id").as("bin"))
    val cells = bins
      .join(binned.filter(col("period") === "ref")
        .select(col("bin"), col("cnt").as("cnt_ref")), Seq("bin"), "left")
      .join(binned.filter(col("period") === "cur")
        .select(col("bin"), col("cnt").as("cnt_cur")), Seq("bin"), "left")
      .withColumn("cnt_ref", coalesce(col("cnt_ref"), lit(0L)))
      .withColumn("cnt_cur", coalesce(col("cnt_cur"), lit(0L)))
      .crossJoin(broadcast(totals.filter(col("period") === "ref")
        .select(col("tot").as("tot_ref"))))
      .crossJoin(broadcast(totals.filter(col("period") === "cur")
        .select(col("tot").as("tot_cur"))))
      .withColumn("p", greatest(col("cnt_ref"), lit(1L)).cast("double") /
        col("tot_ref").cast("double"))
      .withColumn("q", greatest(col("cnt_cur"), lit(1L)).cast("double") /
        col("tot_cur").cast("double"))
      .withColumn("contrib", (col("p") - col("q")) * log(col("p") / col("q")))
    val psi = cells.agg(round(aggregate(
      transform(sort_array(collect_list(struct(col("bin"), col("contrib")))),
        x => x.getField("contrib")),
      lit(0.0), (a, v) => a + v), 4).as("psi"))
    cells.crossJoin(broadcast(psi))
      .select(col("bin"), col("cnt_ref"), col("cnt_cur"), col("p"), col("q"),
        round(col("contrib"), 4).as("contrib"), col("psi"))
      .orderBy(col("bin"))
  }

  val dqPsiSql: String = {
    val bs = (1 to 9).map(k =>
      s"MIN(CASE WHEN cum >= CAST(floor(0.${k} e0 * (n - 1)) AS BIGINT) + 1 THEN v END) AS b$k"
        .replace(" e0", "e0")).mkString(",\n      |    ")
    val binExpr = (1 to 9).map(k => s"CASE WHEN v >= b$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH o AS (SELECT o_totalprice AS v,
      |    CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day FROM orders),
      |md AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS mid FROM o),
      |tg AS (SELECT v, CASE WHEN day < mid THEN 'ref' ELSE 'cur' END AS period
      |  FROM o CROSS JOIN md),
      |rv AS (SELECT v, COUNT(*) AS c FROM tg WHERE period = 'ref' GROUP BY v),
      |rn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM rv),
      |cm AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, n
      |  FROM rv CROSS JOIN rn),
      |bd AS (SELECT
      |    $bs
      |  FROM cm),
      |bn AS (SELECT period, $binExpr AS bin, COUNT(*) AS cnt
      |  FROM tg CROSS JOIN bd GROUP BY 1, 2),
      |tt AS (SELECT period, CAST(SUM(cnt) AS BIGINT) AS tot FROM bn GROUP BY period),
      |cells AS (SELECT b.bin,
      |    COALESCE(r.cnt, 0) AS cnt_ref, COALESCE(c.cnt, 0) AS cnt_cur,
      |    CAST(greatest(COALESCE(r.cnt, 0), 1) AS DOUBLE) /
      |      CAST((SELECT tot FROM tt WHERE period = 'ref') AS DOUBLE) AS p,
      |    CAST(greatest(COALESCE(c.cnt, 0), 1) AS DOUBLE) /
      |      CAST((SELECT tot FROM tt WHERE period = 'cur') AS DOUBLE) AS q
      |  FROM (SELECT unnest(range(0, 10)) AS bin) b
      |  LEFT JOIN (SELECT bin, cnt FROM bn WHERE period = 'ref') r ON r.bin = b.bin
      |  LEFT JOIN (SELECT bin, cnt FROM bn WHERE period = 'cur') c ON c.bin = b.bin),
      |ct AS (SELECT bin, cnt_ref, cnt_cur, p, q, (p - q) * ln(p / q) AS contrib
      |  FROM cells),
      |ps AS (SELECT round(list_reduce(list_prepend(0.0e0,
      |    list(contrib ORDER BY bin)), (a, v) -> a + v), 4) AS psi FROM ct)
      |SELECT bin, cnt_ref, cnt_cur, p, q, round(contrib, 4) AS contrib, psi
      |FROM ct CROSS JOIN ps ORDER BY bin""".stripMargin
  }

  /** EXACT ROC AUC via the Mann–Whitney rank identity — the model-eval
    * operator every classifier gate needs, computed at scale without
    * the sort-and-sweep: AUC = (Σ 2R̄⁺ − n₁(n₁+1)) / (2 n₁ n₀) over
    * DOUBLED average ranks from the two-level cumulative (ties
    * handled exactly; no global sort). Everything is an exact integer
    * until ONE final division. Predictor: order total (cents); label:
    * status 'F'.
    */
  def evalAuc(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables(s, dir, "orders").select(
      round(col("o_totalprice") * 100.0).cast("long").as("v"),
      (col("o_orderstatus") === "F").cast("long").as("y"))
    val rk = cumRanks(rows.groupBy(col("v")).agg(count(lit(1)).as("c")))
      .select(col("v"), (lit(2L) * col("cum") - col("c") + lit(1L)).as("r2"))
    rows.join(rk, "v")
      .agg(sum(col("y")).as("n_pos"),
        sum(lit(1L) - col("y")).as("n_neg"),
        sum(when(col("y") === 1L, col("r2")).otherwise(0L)
          .cast("decimal(38,0)")).cast("double").as("s2pos"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("s2pos") -
            (col("n_pos") * (col("n_pos") + 1)).cast("double")) /
            (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"))
  }

  val evalAucSql: String =
    """WITH r0 AS (SELECT CAST(round(o_totalprice * 100.0e0) AS BIGINT) AS v,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
      |vc AS (SELECT v, COUNT(*) AS c FROM r0 GROUP BY 1),
      |cm AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM vc),
      |rk AS (SELECT v, 2 * cum - c + 1 AS r2 FROM cm),
      |a AS (SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
      |    CAST(SUM(1 - y) AS BIGINT) AS n_neg,
      |    CAST(SUM(CAST(CASE WHEN y = 1 THEN r2 ELSE 0 END AS DECIMAL(38,0))) AS DOUBLE) AS s2pos
      |  FROM r0 JOIN rk USING (v))
      |SELECT n_pos, n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0
      |    THEN (s2pos - CAST(n_pos * (n_pos + 1) AS DOUBLE))
      |      / (2.0e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END AS auc
      |FROM a""".stripMargin

  /** Threshold confusion matrix + exact P/R/F1 at the EXACT median
    * score (selection via the two-level cumulative — the
    * encode_winsorize boundary convention): tp/fp/fn/tn are integer
    * counts; precision and recall are one division each and F1 uses
    * the single-division identity 2tp/(2tp+fp+fn) (never the p·r
    * compound that would add float steps).
    */
  def evalConfusion(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables(s, dir, "orders").select(
      round(col("o_totalprice") * 100.0).cast("long").as("v"),
      (col("o_orderstatus") === "F").cast("long").as("y"))
    val thr = cumRanks(rows.groupBy(col("v")).agg(count(lit(1)).as("c")))
      .agg(min(when(col("cum") >= floor(lit(0.5) * (col("n") - 1)).cast("long") + 1,
        col("v"))).as("thr"))
    rows.crossJoin(broadcast(thr))
      .withColumn("pred", (col("v") >= col("thr")).cast("long"))
      .agg(
        sum(when(col("pred") === 1L && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") === 1L && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(col("pred") === 0L && col("y") === 1L, 1L).otherwise(0L)).as("fn"),
        sum(when(col("pred") === 0L && col("y") === 0L, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          (lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double")).as("f1"))
  }

  val evalConfusionSql: String =
    """WITH r0 AS (SELECT CAST(round(o_totalprice * 100.0e0) AS BIGINT) AS v,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
      |vc AS (SELECT v, COUNT(*) AS c FROM r0 GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc),
      |cm AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, nn.n
      |  FROM vc CROSS JOIN nn),
      |thr AS (SELECT MIN(CASE WHEN cum >= CAST(floor(0.5e0 * (n - 1)) AS BIGINT) + 1
      |    THEN v END) AS thr FROM cm),
      |p AS (SELECT y, CASE WHEN v >= thr THEN 1 ELSE 0 END AS pred
      |  FROM r0 CROSS JOIN thr),
      |a AS (SELECT
      |    CAST(SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |    CAST(SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM p)
      |SELECT tp, fp, fn, tn,
      |  CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
      |  CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
      |  CASE WHEN 2 * tp + fp + fn > 0
      |    THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
      |FROM a""".stripMargin

  /** Calibration curve over EXACT score deciles (the encode_binning
    * discretizer): per-bin observed positive rate vs the overall base
    * rate — the reliability diagram a gate classifier is audited
    * with. All integers until one division per bin.
    */
  def evalCalibration(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables(s, dir, "orders").select(
      round(col("o_totalprice") * 100.0).cast("long").as("v"),
      (col("o_orderstatus") === "F").cast("long").as("y"))
    val rk = cumRanks(
      rows.groupBy(col("v")).agg(count(lit(1)).as("c")))
      .withColumn("bin", expr("(cum - 1) * 10 div n"))
      .select(col("v"), col("bin"))
    rows.join(rk, "v")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .withColumn("rate", col("n_pos").cast("double") / col("n").cast("double"))
      .orderBy(col("bin"))
  }

  val evalCalibrationSql: String =
    """WITH r0 AS (SELECT CAST(round(o_totalprice * 100.0e0) AS BIGINT) AS v,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
      |vc AS (SELECT v, COUNT(*) AS c FROM r0 GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc),
      |cm AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, nn.n
      |  FROM vc CROSS JOIN nn),
      |rk AS (SELECT v, ((cum - 1) * 10) // n AS bin FROM cm)
      |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
      |  CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rate
      |FROM r0 JOIN rk USING (v)
      |GROUP BY bin ORDER BY bin""".stripMargin

  /** Holdout calibration error (ECE, Naeini et al. 2015 shape) — the
    * evaluation [[evalCalibration]]'s reliability curve feeds: the
    * per-decile "predicted" probability is the TRAIN split's
    * (o_orderkey % 5 ≠ 0) empirical rate, scored against the test
    * split's rate in the same decile; ECE = Σ (n_test_b / N_test) ·
    * |conf_b − acc_b|. Bins are the pooled exact price deciles (a
    * deterministic feature transform, identical for both splits).
    *
    * Determinism: every rate is one division of exact integers; the
    * 10-term ECE sum is a bin-ordered double fold (collect_list +
    * aggregate ≡ list_reduce over list(... ORDER BY bin)) — never an
    * order-dependent SUM of doubles.
    *
    * Scale: the calibration shape (one value-histogram cumulative +
    * one hash agg), then a 10-row fold.
    */
  def evalEce(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables(s, dir, "orders").select(
      round(col("o_totalprice") * 100.0).cast("long").as("v"),
      (col("o_orderstatus") === "F").cast("long").as("y"),
      (col("o_orderkey") % 5 =!= 0).as("is_train"))
    val rk = cumRanks(
      rows.groupBy(col("v")).agg(count(lit(1)).as("c")))
      .withColumn("bin", expr("(cum - 1) * 10 div n"))
      .select(col("v"), col("bin"))
    val bins = rows.join(rk, "v")
      .groupBy(col("bin"))
      .agg(
        sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
        sum(when(col("is_train"), col("y")).otherwise(0L)).as("n_pos_train"),
        sum(when(!col("is_train"), 1L).otherwise(0L)).as("n_test"),
        sum(when(!col("is_train"), col("y")).otherwise(0L)).as("n_pos_test"))
      // degenerate-split guards (ANSI divide-by-zero, edge corpus): a
      // bin with no train or no test rows reports NULL conf/acc/gap
      // and contributes 0 to ECE — mirrored in the oracle
      .withColumn("conf", when(col("n_train") > 0,
        col("n_pos_train").cast("double") / col("n_train").cast("double")))
      .withColumn("acc", when(col("n_test") > 0,
        col("n_pos_test").cast("double") / col("n_test").cast("double")))
      .withColumn("gap", abs(col("conf") - col("acc")))
      // r12: ≤10 rows consumed by THREE downstream branches (total,
      // contrib, final projection) — each re-ran the corpus scan +
      // decile machinery (profiled 28 jobs); one eager checkpoint
      .localCheckpoint(true)
    val tot = bins.agg(sum(col("n_test")).as("nt_all"))
    val withContrib = bins.crossJoin(broadcast(tot))
      .withColumn("contrib", when(col("gap").isNotNull && col("nt_all") > 0,
        col("n_test").cast("double") / col("nt_all").cast("double") *
          col("gap")).otherwise(lit(0.0)))
    val ece = withContrib
      .agg(sort_array(collect_list(struct(col("bin"), col("contrib")))).as("cs"))
      .select(aggregate(col("cs"), lit(0.0),
        (acc, x) => acc + x.getField("contrib")).as("ece"))
    withContrib.crossJoin(broadcast(ece))
      .select(col("bin"), col("n_train"), col("n_pos_train"),
        col("n_test"), col("n_pos_test"), col("conf"), col("acc"),
        col("gap"), col("ece"))
      .orderBy(col("bin"))
  }

  val evalEceSql: String =
    """WITH r0 AS (SELECT CAST(round(o_totalprice * 100.0e0) AS BIGINT) AS v,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |    o_orderkey % 5 <> 0 AS is_train FROM orders),
      |vc AS (SELECT v, COUNT(*) AS c FROM r0 GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc),
      |cm AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, nn.n
      |  FROM vc CROSS JOIN nn),
      |rk AS (SELECT v, ((cum - 1) * 10) // n AS bin FROM cm),
      |bins AS (SELECT bin,
      |    CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |    CAST(SUM(CASE WHEN is_train THEN y ELSE 0 END) AS BIGINT) AS n_pos_train,
      |    CAST(SUM(CASE WHEN NOT is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
      |    CAST(SUM(CASE WHEN NOT is_train THEN y ELSE 0 END) AS BIGINT) AS n_pos_test
      |  FROM r0 JOIN rk USING (v) GROUP BY bin),
      |rt AS (SELECT *,
      |    CASE WHEN n_train > 0 THEN CAST(n_pos_train AS DOUBLE)
      |      / CAST(n_train AS DOUBLE) END AS conf,
      |    CASE WHEN n_test > 0 THEN CAST(n_pos_test AS DOUBLE)
      |      / CAST(n_test AS DOUBLE) END AS acc
      |  FROM bins),
      |g AS (SELECT *, abs(conf - acc) AS gap,
      |    (SELECT CAST(SUM(n_test) AS BIGINT) FROM bins) AS nt_all
      |  FROM rt),
      |c AS (SELECT *, CASE WHEN gap IS NOT NULL AND nt_all > 0
      |    THEN CAST(n_test AS DOUBLE) / CAST(nt_all AS DOUBLE) * gap
      |    ELSE 0.0e0 END AS contrib FROM g),
      |e AS (SELECT list_reduce(list_prepend(0.0e0,
      |    list(contrib ORDER BY bin)), (a, b) -> a + b) AS ece FROM c)
      |SELECT bin, n_train, n_pos_train, n_test, n_pos_test, conf, acc,
      |  gap, ece
      |FROM c CROSS JOIN e ORDER BY bin""".stripMargin

  /** Cumulative gains / lift chart over DESCENDING score deciles —
    * the targeting chart next to [[evalCalibration]]'s reliability
    * curve: gain = cumulative share of positives captured, lift =
    * gain over cumulative population share. Bins are the exact
    * equi-depth deciles; cumulatives run in a 10-ROW window (the
    * domain is the decile alphabet — single-partition by
    * construction, the cumRanks-offsets precedent); every ratio is a
    * short mirrored IEEE chain over exact integers.
    */
  def evalLift(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables(s, dir, "orders").select(
      round(col("o_totalprice") * 100.0).cast("long").as("v"),
      (col("o_orderstatus") === "F").cast("long").as("y"))
    val rk = cumRanks(rows.groupBy(col("v")).agg(count(lit(1)).as("c")))
      .withColumn("bin", expr("(cum - 1) * 10 div n"))
      .select(col("v"), (lit(9L) - col("bin")).as("dbin")) // 0 = top scores
    val bins = rows.join(rk, "v")
      .groupBy(col("dbin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val w = Window.orderBy(col("dbin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .crossJoin(broadcast(rows.agg(count(lit(1)).as("tot_n"),
        sum(col("y")).as("tot_pos"))))
      .select(col("dbin"), col("n"), col("n_pos"), col("cum_n"), col("cum_pos"),
        when(col("tot_pos") > 0,
          col("cum_pos").cast("double") / col("tot_pos").cast("double")).as("gain"),
        when(col("tot_pos") > 0 && col("cum_n") > 0,
          (col("cum_pos").cast("double") / col("tot_pos").cast("double")) /
            (col("cum_n").cast("double") / col("tot_n").cast("double"))).as("lift"))
      .orderBy(col("dbin"))
  }

  val evalLiftSql: String =
    """WITH r0 AS (SELECT CAST(round(o_totalprice * 100.0e0) AS BIGINT) AS v,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
      |vc AS (SELECT v, COUNT(*) AS c FROM r0 GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc),
      |cm AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, nn.n
      |  FROM vc CROSS JOIN nn),
      |rk AS (SELECT v, 9 - ((cum - 1) * 10) // n AS dbin FROM cm),
      |bins AS (SELECT dbin, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS n_pos
      |  FROM r0 JOIN rk USING (v) GROUP BY dbin),
      |cum AS (SELECT dbin, n, n_pos,
      |    CAST(SUM(n) OVER (ORDER BY dbin) AS BIGINT) AS cum_n,
      |    CAST(SUM(n_pos) OVER (ORDER BY dbin) AS BIGINT) AS cum_pos
      |  FROM bins),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot_n,
      |    CAST(SUM(y) AS BIGINT) AS tot_pos FROM r0)
      |SELECT dbin, n, n_pos, cum_n, cum_pos,
      |  CASE WHEN tot_pos > 0
      |    THEN CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) END AS gain,
      |  CASE WHEN tot_pos > 0 AND cum_n > 0
      |    THEN (CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE))
      |      / (CAST(cum_n AS DOUBLE) / CAST(tot_n AS DOUBLE)) END AS lift
      |FROM cum CROSS JOIN tot ORDER BY dbin""".stripMargin

  /** The three classic feature scalers side by side — z-score, min-max
    * and robust (median/IQR) — per event type, emitted for a
    * deterministic keyed sample of rows (event_id % 47 = 0; the stats
    * themselves aggregate over ALL rows). Values ride as exact cents;
    * mean/std come from DECIMAL(38,0) moments (σ via sqrt only), the
    * quartiles are rank SELECTIONS off the grouped two-level cumulative
    * (floor-division ranks, clamped — the stats_levene discipline), so
    * every emitted double is one short fixed IEEE chain. Two keyed
    * aggregations + a broadcast join back to the sampled rows.
    */
  def featureScale(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type").as("g"),
        round(col("value") * 100.0).cast("long").as("v"), col("value"))
    def dsum(c: org.apache.spark.sql.Column, out: String) =
      sum(c.cast("decimal(38,0)")).cast("double").as(out)
    val mom = ev.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("n"),
        dsum(col("v"), "s1"), dsum(col("v") * col("v"), "s2"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("std", sqrt(col("s2") / col("n") - col("mean") * col("mean")))
    val vc = ev.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val cr = cumRanksBy(vc)
    def selAt(rank: org.apache.spark.sql.Column, out: String) =
      cr.filter(col("cum") >= rank && col("cum") - col("c") < rank)
        .select(col("g"), col("v").as(out))
    val r1 = greatest(((col("n") + 1) / 4).cast("long"), lit(1L))
    val r2 = ((col("n") + 1) / 2).cast("long")
    val r3 = least(((lit(3L) * (col("n") + 1)) / 4).cast("long"), col("n"))
    val qs = selAt(r1, "q1").join(selAt(r2, "q2"), "g").join(selAt(r3, "q3"), "g")
    ev.filter(pmod(col("event_id"), lit(47L)) === 0L)
      .join(broadcast(mom.select(col("g"), col("mean"), col("std"),
        col("vmin"), col("vmax"))), "g")
      .join(broadcast(qs), "g")
      .select(col("event_id"), col("g").as("event_type"), col("value"),
        when(col("std") > 0.0,
          (col("v").cast("double") - col("mean")) / col("std")).as("z"),
        when(col("vmax") > col("vmin"),
          (col("v") - col("vmin")).cast("double") /
            (col("vmax") - col("vmin")).cast("double")).as("minmax"),
        when(col("q3") > col("q1"),
          (col("v").cast("double") - col("q2").cast("double")) /
            (col("q3") - col("q1")).cast("double")).as("robust"))
      .orderBy(col("event_id"))
  }

  val featureScaleSql: String =
    """WITH ev AS (SELECT event_id, event_type AS g,
      |    CAST(round(value * 100.0e0) AS BIGINT) AS v, value
      |  FROM events WHERE value IS NOT NULL),
      |mom AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(v * v AS DECIMAL(38,0))) AS DOUBLE) AS s2,
      |    MIN(v) AS vmin, MAX(v) AS vmax
      |  FROM ev GROUP BY g),
      |m2 AS (SELECT *, s1 / n AS mean,
      |    sqrt(s2 / n - (s1 / n) * (s1 / n)) AS std FROM mom),
      |vc AS (SELECT g, v, COUNT(*) AS c FROM ev GROUP BY g, v),
      |cm AS (SELECT g, v, c,
      |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum,
      |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n FROM vc),
      |q1 AS (SELECT g, v AS q1 FROM cm
      |  WHERE cum >= greatest((n + 1) // 4, 1) AND cum - c < greatest((n + 1) // 4, 1)),
      |q2 AS (SELECT g, v AS q2 FROM cm
      |  WHERE cum >= (n + 1) // 2 AND cum - c < (n + 1) // 2),
      |q3 AS (SELECT g, v AS q3 FROM cm
      |  WHERE cum >= least((3 * (n + 1)) // 4, n) AND cum - c < least((3 * (n + 1)) // 4, n))
      |SELECT ev.event_id, ev.g AS event_type, ev.value,
      |  CASE WHEN std > 0 THEN (CAST(v AS DOUBLE) - mean) / std END AS z,
      |  CASE WHEN vmax > vmin THEN CAST(v - vmin AS DOUBLE) / CAST(vmax - vmin AS DOUBLE) END AS minmax,
      |  CASE WHEN q3.q3 > q1.q1 THEN (CAST(v AS DOUBLE) - CAST(q2.q2 AS DOUBLE))
      |    / CAST(q3.q3 - q1.q1 AS DOUBLE) END AS robust
      |FROM ev JOIN m2 USING (g) JOIN q1 USING (g) JOIN q2 USING (g) JOIN q3 USING (g)
      |WHERE ev.event_id % 47 = 0
      |ORDER BY event_id""".stripMargin

  /** Qini (uplift) curve — [[evalLift]]'s sibling for treatment-effect
    * targeting: a salted-hash 50/50 treatment split (the pipeline_split
    * convention, so assignment is deterministic and replayable), exact
    * descending score deciles shared with the lift chart, and per-bin
    * cumulative qini = Y_t − Y_c·(N_t/N_c) — integer counts until one
    * product and two divisions per bin. 10-row cumulative window; the
    * same one-pass shape as eval_lift at any scale.
    */
  def evalQini(s: SparkSession, dir: String): DataFrame = {
    val rows = graft.Tables(s, dir, "orders").select(
      round(col("o_totalprice") * 100.0).cast("long").as("v"),
      (col("o_orderstatus") === "F").cast("long").as("y"),
      pmod(conv(substr(md5(concat(lit("up:"), col("o_orderkey").cast("string"))),
        lit(1), lit(8)), 16, 10).cast("long"), lit(2)).as("t"))
    val rk = cumRanks(rows.groupBy(col("v")).agg(count(lit(1)).as("c")))
      .withColumn("bin", expr("(cum - 1) * 10 div n"))
      .select(col("v"), (lit(9L) - col("bin")).as("dbin"))
    val bins = rows.join(rk, "v")
      .groupBy(col("dbin"))
      .agg(sum(col("t")).as("n_t"), sum(lit(1L) - col("t")).as("n_c"),
        sum(when(col("t") === 1L, col("y")).otherwise(0L)).as("y_t"),
        sum(when(col("t") === 0L, col("y")).otherwise(0L)).as("y_c"))
    val w = Window.orderBy(col("dbin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum_nt", sum(col("n_t")).over(w))
      .withColumn("cum_nc", sum(col("n_c")).over(w))
      .withColumn("cum_yt", sum(col("y_t")).over(w))
      .withColumn("cum_yc", sum(col("y_c")).over(w))
      .select(col("dbin"), col("n_t"), col("n_c"), col("y_t"), col("y_c"),
        col("cum_nt"), col("cum_nc"), col("cum_yt"), col("cum_yc"),
        when(col("cum_nc") > 0L,
          col("cum_yt").cast("double") -
            col("cum_yc").cast("double") *
              (col("cum_nt").cast("double") / col("cum_nc").cast("double")))
          .as("qini"))
      .orderBy(col("dbin"))
  }

  val evalQiniSql: String =
    """WITH r0 AS (SELECT CAST(round(o_totalprice * 100.0e0) AS BIGINT) AS v,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |    CAST(concat('0x', substr(md5('up:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 2 AS t
      |  FROM orders),
      |vc AS (SELECT v, COUNT(*) AS c FROM r0 GROUP BY 1),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc),
      |cm AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum, nn.n
      |  FROM vc CROSS JOIN nn),
      |rk AS (SELECT v, 9 - ((cum - 1) * 10) // n AS dbin FROM cm),
      |bins AS (SELECT dbin, CAST(SUM(t) AS BIGINT) AS n_t,
      |    CAST(SUM(1 - t) AS BIGINT) AS n_c,
      |    CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS y_t,
      |    CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS y_c
      |  FROM r0 JOIN rk USING (v) GROUP BY dbin),
      |cum AS (SELECT dbin, n_t, n_c, y_t, y_c,
      |    CAST(SUM(n_t) OVER (ORDER BY dbin) AS BIGINT) AS cum_nt,
      |    CAST(SUM(n_c) OVER (ORDER BY dbin) AS BIGINT) AS cum_nc,
      |    CAST(SUM(y_t) OVER (ORDER BY dbin) AS BIGINT) AS cum_yt,
      |    CAST(SUM(y_c) OVER (ORDER BY dbin) AS BIGINT) AS cum_yc
      |  FROM bins)
      |SELECT dbin, n_t, n_c, y_t, y_c, cum_nt, cum_nc, cum_yt, cum_yc,
      |  CASE WHEN cum_nc > 0 THEN CAST(cum_yt AS DOUBLE)
      |    - CAST(cum_yc AS DOUBLE) * (CAST(cum_nt AS DOUBLE) / CAST(cum_nc AS DOUBLE))
      |  END AS qini
      |FROM cum ORDER BY dbin""".stripMargin

  /** Regression-metric suite (MAE / RMSE / bias / R²) for a numeric
    * forecaster — here the seasonal-naive predictor (count(d) ≈
    * count(d−7)) over per-type daily volumes, the [[TimeSeriesQueries
    * .tsBacktest]] champion scored with the metrics a model card
    * reports. Actuals and predictions are exact integers, so SSE/SAE
    * are DECIMAL(38,0) sums and every metric is one or two IEEE ops;
    * R²'s SST comes from the same moment trick as the variance chain.
    * Two keyed aggregations (daily counts, then per-type metrics) —
    * one 7-day shifted self-join, no window.
    */
  def evalRegression(s: SparkSession, dir: String): DataFrame = {
    val daily = graft.Tables(s, dir, "events")
      .withColumn("day", (unix_millis(col("ts")) / lit(86400000L)).cast("long"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
    val pred = daily.select(col("event_type"), (col("day") + 7L).as("day"),
      col("cnt").as("p"))
    def dsum(c: org.apache.spark.sql.Column, out: String) =
      sum(c.cast("decimal(38,0)")).cast("double").as(out)
    daily.join(pred, Seq("event_type", "day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), count(lit(1)).cast("double").as("n"),
        dsum(abs(col("cnt") - col("p")), "sae"),
        dsum((col("cnt") - col("p")) * (col("cnt") - col("p")), "sse"),
        dsum(col("cnt") - col("p"), "sdiff"),
        dsum(col("cnt"), "s1"), dsum(col("cnt") * col("cnt"), "s2"))
      .withColumn("sst", col("s2") - col("s1") * col("s1") / col("n"))
      .select(col("event_type"), col("n_days"),
        (col("sae") / col("n")).as("mae"),
        sqrt(col("sse") / col("n")).as("rmse"),
        (col("sdiff") / col("n")).as("bias"),
        when(col("sst") > 0.0, lit(1.0) - col("sse") / col("sst")).as("r2"))
      .orderBy(col("event_type"))
  }

  val evalRegressionSql: String =
    """WITH daily AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      |j AS (SELECT a.event_type, a.cnt, p.cnt AS p
      |  FROM daily a JOIN daily p
      |    ON p.event_type = a.event_type AND p.day + 7 = a.day),
      |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(abs(cnt - p) AS DECIMAL(38,0))) AS DOUBLE) AS sae,
      |    CAST(SUM(CAST((cnt - p) * (cnt - p) AS DECIMAL(38,0))) AS DOUBLE) AS sse,
      |    CAST(SUM(CAST(cnt - p AS DECIMAL(38,0))) AS DOUBLE) AS sdiff,
      |    CAST(SUM(CAST(cnt AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(cnt * cnt AS DECIMAL(38,0))) AS DOUBLE) AS s2
      |  FROM j GROUP BY event_type),
      |t AS (SELECT *, s2 - s1 * s1 / n AS sst FROM m)
      |SELECT event_type, n_days, sae / n AS mae, sqrt(sse / n) AS rmse,
      |  sdiff / n AS bias,
      |  CASE WHEN sst > 0 THEN 1.0e0 - sse / sst END AS r2
      |FROM t ORDER BY event_type""".stripMargin

  /** Referential-integrity audit over the star schema's five foreign
    * keys — the DQ gate a warehouse load runs before anything else
    * (orphan children mean a broken upstream join). One row per
    * relationship: child row count, distinct child keys, and orphan
    * rows (child keys with no parent). Orphans via a left join +
    * parent-null count, NOT a driver-side anti-join loop; on a real
    * cluster the small parents (nation/customer/supplier/part)
    * broadcast and orders↔lineitem shuffles on its key once. All
    * counts integral.
    */
  def dqReferential(s: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, ck: String,
            parent: DataFrame, pk: String): DataFrame = {
      val p = parent.select(col(pk).as("__pk"), lit(1L).as("__hit"))
      child.select(col(ck).as("__ck"))
        .join(p, col("__ck") === col("__pk"), "left")
        .agg(count(lit(1)).as("child_rows"),
          count_distinct(col("__ck")).as("distinct_keys"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("orphan_rows"))
        .select(lit(name).as("relationship"), col("child_rows"),
          col("distinct_keys"), col("orphan_rows"))
    }
    val t = (n: String) => Tables(s, dir, n)
    rel("customer->nation", t("customer"), "c_nationkey", t("nation"), "n_nationkey")
      .unionAll(rel("lineitem->orders", t("lineitem"), "l_orderkey", t("orders"), "o_orderkey"))
      .unionAll(rel("lineitem->part", t("lineitem"), "l_partkey", t("part"), "p_partkey"))
      .unionAll(rel("lineitem->supplier", t("lineitem"), "l_suppkey", t("supplier"), "s_suppkey"))
      .unionAll(rel("orders->customer", t("orders"), "o_custkey", t("customer"), "c_custkey"))
      .orderBy(col("relationship"))
  }

  val dqReferentialSql: String =
    """WITH r AS (
      |  SELECT 'customer->nation' AS relationship,
      |    CAST(COUNT(*) AS BIGINT) AS child_rows,
      |    CAST(COUNT(DISTINCT c.c_nationkey) AS BIGINT) AS distinct_keys,
      |    CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows
      |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  UNION ALL
      |  SELECT 'lineitem->orders', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT),
      |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT),
      |    CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |  UNION ALL
      |  SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT),
      |    CAST(SUM(CASE WHEN su.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN supplier su ON l.l_suppkey = su.s_suppkey
      |  UNION ALL
      |  SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT),
      |    CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
      |SELECT * FROM r ORDER BY relationship""".stripMargin

  /** Decision-stump training (the depth-1 CART split, Breiman et al.
    * 1984) as a certified query: the best threshold on `l_quantity`
    * for predicting `l_returnflag = 'R'`, chosen by weighted Gini
    * impurity over every distinct feature value. Emits the FULL
    * candidate table (threshold, side counts, impurity) with the
    * argmin flagged — the shape a boosted-stump trainer scans.
    *
    * Determinism: side counts come from one integer histogram fold
    * in ascending feature order; each candidate's Gini is a fixed
    * 11-op IEEE chain over exact int→double casts, identical in the
    * oracle, so even ties resolve identically (argmin tiebreak =
    * lowest threshold, computed on exact values, not rounded ones).
    *
    * Scale: one map-side-combinable histogram groupBy; the fold runs
    * over the feature's VALUE ALPHABET (50 here), never the corpus —
    * the classic "train on sufficient statistics" factorization.
    */
  def mlStump(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables(s, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("q"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .groupBy(col("q")).agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val one = hist.agg(sum(col("n")).as("nn"), sum(col("p")).as("pp"),
      sort_array(collect_list(struct(col("q"), col("n"), col("p")))).as("xs"))
    val outT = "array<struct<t:bigint,nl:bigint,pl:bigint,nr:bigint,pr:bigint,gini:double>>"
    val cand = one.select(col("nn"), aggregate(col("xs"),
      struct(array().cast(outT).as("out"), lit(0L).as("cl"), lit(0L).as("cp")),
      (acc, x) => {
        val nl2 = acc.getField("cl") + x.getField("n")
        val pl2 = acc.getField("cp") + x.getField("p")
        val nr2 = col("nn") - nl2
        val pr2 = col("pp") - pl2
        val plf = pl2.cast("double") / nl2.cast("double")
        val prf = pr2.cast("double") / when(nr2 > 0, nr2).otherwise(1L).cast("double")
        val gl = lit(1.0) - plf * plf - (lit(1.0) - plf) * (lit(1.0) - plf)
        val gr = lit(1.0) - prf * prf - (lit(1.0) - prf) * (lit(1.0) - prf)
        val g = nl2.cast("double") / col("nn").cast("double") * gl +
          nr2.cast("double") / col("nn").cast("double") * gr
        struct(
          when(nr2 > 0, concat(acc.getField("out"), array(struct(
            x.getField("q").as("t"), nl2.as("nl"), pl2.as("pl"),
            nr2.as("nr"), pr2.as("pr"), g.as("gini")))))
            .otherwise(acc.getField("out")).as("out"),
          nl2.as("cl"), pl2.as("cp"))
      }).getField("out").as("out"))
    cand
      .withColumn("best_g", array_min(transform(col("out"), r => r.getField("gini"))))
      .withColumn("best_t", array_min(transform(
        filter(col("out"), r => r.getField("gini") === col("best_g")),
        r => r.getField("t"))))
      .select(explode(col("out")).as("r"), col("best_g"), col("best_t"))
      .select(col("r.t").as("threshold"), col("r.nl").as("n_left"),
        col("r.pl").as("pos_left"), col("r.nr").as("n_right"),
        col("r.pr").as("pos_right"), col("r.gini").as("gini"),
        (col("r.gini") === col("best_g") && col("r.t") === col("best_t"))
          .as("is_best"))
      .orderBy(col("threshold"))
  }

  /** Oracle: the identical per-candidate Gini chain, with the
    * cumulative side counts from integer window sums (DuckDB 1.0
    * cannot grow a list inside a struct accumulator, and integer
    * cumsums are order-independent, so the windowed form is the
    * faithful value-level replay of the Spark fold).
    */
  val mlStumpSql: String =
    """WITH hist AS (SELECT CAST(l_quantity AS BIGINT) AS q,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS p
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(p) AS BIGINT) AS pp FROM hist),
      |cum AS (SELECT q, CAST(SUM(n) OVER (ORDER BY q) AS BIGINT) AS nl,
      |    CAST(SUM(p) OVER (ORDER BY q) AS BIGINT) AS pl
      |  FROM hist),
      |sides AS (SELECT q, nl, pl, nn - nl AS nr, pp - pl AS pr, nn
      |  FROM cum, tot WHERE nn - nl > 0),
      |gini AS (SELECT q, nl, pl, nr, pr,
      |    CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE)
      |      * ((1.0e0 - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
      |            * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)))
      |         - (1.0e0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
      |            * (1.0e0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)))
      |    + CAST(nr AS DOUBLE) / CAST(nn AS DOUBLE)
      |      * ((1.0e0 - (CAST(pr AS DOUBLE) / CAST(CASE WHEN nr > 0 THEN nr ELSE 1 END AS DOUBLE))
      |            * (CAST(pr AS DOUBLE) / CAST(CASE WHEN nr > 0 THEN nr ELSE 1 END AS DOUBLE)))
      |         - (1.0e0 - CAST(pr AS DOUBLE) / CAST(CASE WHEN nr > 0 THEN nr ELSE 1 END AS DOUBLE))
      |            * (1.0e0 - CAST(pr AS DOUBLE) / CAST(CASE WHEN nr > 0 THEN nr ELSE 1 END AS DOUBLE)))
      |      AS g
      |  FROM sides),
      |best AS (SELECT MIN(g) AS best_g FROM gini),
      |bestt AS (SELECT MIN(q) AS best_t FROM gini, best WHERE g = best_g)
      |SELECT q AS threshold, nl AS n_left, pl AS pos_left,
      |  nr AS n_right, pr AS pos_right, g AS gini,
      |  (g = best_g AND q = best_t) AS is_best
      |FROM gini, best, bestt
      |ORDER BY threshold""".stripMargin

  /** Weight-of-evidence categorical encoding with the information
    * value per category (Siddiqi 2006, the credit-scorecard
    * standard): for customer nation vs the urgent-order target,
    * woe = ln(((pos+½)/P) / ((neg+½)/N)) with the ½ Laplace
    * smoothing, iv_term = (pos/P − neg/N)·woe. Complements
    * `encode_target` (mean encoding) for log-odds models.
    *
    * Cross-engine ln: the `text_pmi` convention — the ratio is an
    * exact short chain, the emitted woe/iv are rounded to 4 decimals
    * (ln's 1-ulp wobble cannot flip a 4dp boundary on this data, and
    * iv multiplies the ROUNDED woe so it inherits determinism).
    */
  def encodeWoe(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders").select(col("o_custkey"),
      when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y"))
    val c = Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n = Tables(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val agg0 = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    val tot = agg0.agg(sum(col("pos")).as("tp"), sum(col("neg")).as("tn"))
    agg0.crossJoin(broadcast(tot))
      .withColumn("woe", round(log(
        ((col("pos").cast("double") + lit(0.5)) * col("tn").cast("double")) /
          ((col("neg").cast("double") + lit(0.5)) * col("tp").cast("double"))), 4))
      .select(col("n_name").as("nation"), col("pos"), col("neg"),
        col("woe"),
        round((col("pos").cast("double") / col("tp").cast("double") -
          col("neg").cast("double") / col("tn").cast("double")) * col("woe"), 4)
          .as("iv_term"))
      .orderBy(col("nation"))
  }

  val encodeWoeSql: String =
    """WITH agg0 AS (SELECT n.n_name,
      |    CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
      |    CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS BIGINT) AS neg
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS tp, CAST(SUM(neg) AS BIGINT) AS tn FROM agg0),
      |w AS (SELECT n_name, pos, neg,
      |    round(ln(((CAST(pos AS DOUBLE) + 0.5e0) * CAST(tn AS DOUBLE))
      |      / ((CAST(neg AS DOUBLE) + 0.5e0) * CAST(tp AS DOUBLE))), 4) AS woe,
      |    tp, tn
      |  FROM agg0, tot)
      |SELECT n_name AS nation, pos, neg, woe,
      |  round((CAST(pos AS DOUBLE) / CAST(tp AS DOUBLE)
      |    - CAST(neg AS DOUBLE) / CAST(tn AS DOUBLE)) * woe, 4) AS iv_term
      |FROM w ORDER BY nation""".stripMargin

  /** Tukey-fence outlier audit (Tukey 1977's 1.5·IQR rule) of account
    * balances per market segment — the rank-based robust complement
    * to the parametric dq_mahalanobis: exact per-segment quartiles by
    * rank selection, then counts outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR].
    *
    * Determinism: quartiles are rank SELECTIONS off the grouped
    * two-level cumulative (integer cents, no float boundary); the
    * half-cent fence is avoided by comparing DOUBLED values —
    * outlier_low ⇔ 2v < 2·Q1 − 3·IQR — so the whole audit is pure
    * integer arithmetic; the rate is one division.
    *
    * Scale: [[cumRanksBy]] over the per-segment value alphabet + one
    * corpus aggregation with the ≤|segments| fence table broadcast.
    */
  def dqOutlierIqr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = Tables(s, dir, "customer")
      .select(col("c_mktsegment").as("g"),
        round(col("c_acctbal") * 100.0).cast("long").as("v"))
    val ranked = cumRanksBy(rows.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("c")))
    def q(p: Long, name: String): DataFrame = ranked
      .filter(col("cum") >= expr(s"$p * (n - 1) div 100") + 1L)
      .groupBy(col("g")).agg(min(col("v")).as(name), max(col("n")).as(s"n_$name"))
    val fences = broadcast(q(25, "q1").join(q(75, "q3"), "g")
      .withColumn("iqr", col("q3") - col("q1"))
      .select(col("g"), col("n_q1").as("n"), col("q1"), col("q3"), col("iqr")))
    rows.join(fences, "g")
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("q1")).as("q1"),
        max(col("q3")).as("q3"), max(col("iqr")).as("iqr"),
        sum((lit(2L) * col("v") < lit(2L) * col("q1") - lit(3L) * col("iqr"))
          .cast("long")).as("n_low"),
        sum((lit(2L) * col("v") > lit(2L) * col("q3") + lit(3L) * col("iqr"))
          .cast("long")).as("n_high"))
      .withColumn("outlier_rate", when(col("n") > 0,
        (col("n_low") + col("n_high")).cast("double") / col("n").cast("double")))
      .select(col("g").as("segment"), col("n"), col("q1"), col("q3"),
        col("iqr"), col("n_low"), col("n_high"), col("outlier_rate"))
      .orderBy(col("segment"))
  }

  val dqOutlierIqrSql: String =
    """WITH rows0 AS (SELECT c_mktsegment AS g,
      |    CAST(round(c_acctbal * 100.0e0) AS BIGINT) AS v FROM customer),
      |vals AS (SELECT g, v, COUNT(*) AS c FROM rows0 GROUP BY 1, 2),
      |r AS (SELECT g, v,
      |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum,
      |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
      |  FROM vals),
      |q1 AS (SELECT g, MIN(v) AS q1, MAX(n) AS n FROM r
      |  WHERE cum >= 25 * (n - 1) // 100 + 1 GROUP BY 1),
      |q3 AS (SELECT g, MIN(v) AS q3 FROM r
      |  WHERE cum >= 75 * (n - 1) // 100 + 1 GROUP BY 1),
      |f AS (SELECT q1.g, q1.n, q1.q1, q3.q3, q3.q3 - q1.q1 AS iqr
      |  FROM q1 JOIN q3 USING (g)),
      |agg AS (SELECT rows0.g, MAX(f.n) AS n, MAX(f.q1) AS q1,
      |    MAX(f.q3) AS q3, MAX(f.iqr) AS iqr,
      |    CAST(SUM(CASE WHEN 2 * v < 2 * f.q1 - 3 * f.iqr
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |    CAST(SUM(CASE WHEN 2 * v > 2 * f.q3 + 3 * f.iqr
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |  FROM rows0 JOIN f USING (g) GROUP BY 1)
      |SELECT g AS segment, n, q1, q3, iqr, n_low, n_high,
      |  CASE WHEN n > 0 THEN CAST(n_low + n_high AS DOUBLE)
      |    / CAST(n AS DOUBLE) END AS outlier_rate
      |FROM agg ORDER BY segment""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_outlier_iqr" -> (dqOutlierIqr _),
    "ml_stump" -> (mlStump _),
    "encode_woe" -> (encodeWoe _),
    "dq_referential" -> (dqReferential _),
    "eval_regression" -> (evalRegression _),
    "eval_qini" -> (evalQini _),
    "feature_scale" -> (featureScale _),
    "eval_lift" -> (evalLift _),
    "eval_auc" -> (evalAuc _),
    "eval_confusion" -> (evalConfusion _),
    "eval_calibration" -> (evalCalibration _),
    "eval_ece" -> (evalEce _),
    "dq_psi" -> (dqPsi _),
    "rfm_scores" -> (rfmScores _),
    "pivot_events" -> (pivotEvents _),
    "reshape_unpivot" -> (reshapeUnpivot _),
    "encode_target" -> (encodeTarget _),
    "encode_binning" -> (encodeBinning _),
    "encode_winsorize" -> (encodeWinsorize _))

  val oracles: Map[String, String] = Map(
    "dq_outlier_iqr" -> dqOutlierIqrSql,
    "ml_stump" -> mlStumpSql,
    "encode_woe" -> encodeWoeSql,
    "dq_referential" -> dqReferentialSql,
    "eval_regression" -> evalRegressionSql,
    "eval_qini" -> evalQiniSql,
    "feature_scale" -> featureScaleSql,
    "eval_lift" -> evalLiftSql,
    "eval_auc" -> evalAucSql,
    "eval_confusion" -> evalConfusionSql,
    "eval_calibration" -> evalCalibrationSql,
    "eval_ece" -> evalEceSql,
    "dq_psi" -> dqPsiSql,
    "rfm_scores" -> rfmScoresSql,
    "pivot_events" -> pivotEventsSql,
    "reshape_unpivot" -> reshapeUnpivotSql,
    "encode_target" -> encodeTargetSql,
    "encode_binning" -> encodeBinningSql,
    "encode_winsorize" -> encodeWinsorizeSql)
}
