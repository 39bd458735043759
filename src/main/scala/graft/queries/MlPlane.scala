package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 closed-form ML plane: k-means (unrolled deterministic
  * Lloyd), 2-feature PCA (closed-form 2×2 eigen decomposition), the
  * ridge-regression regularization path (Cramer on the damped normal
  * equations — the stats_ols chain plus λ on the feature diagonal),
  * and a Mahalanobis-distance outlier audit (closed-form 2×2
  * covariance inverse).
  *
  * House determinism rules throughout: every aggregation is an exact
  * integer/DECIMAL(38,0) sum cast to double ONCE; everything after is
  * a short fixed-order IEEE chain (+ − × ÷ and correctly-rounded
  * sqrt) mirrored token-for-token by the DuckDB oracle, so outputs
  * hash unrounded. No iterative solver state lives on the driver —
  * the k-means "model" is a 4-row DataFrame, so the same plan runs
  * against 100 TB unchanged.
  */
object MlPlane {

  /** Deterministic integer coordinate in [0, 10⁶): first 8 md5 hex
    * digits of (salt ‖ key) mod 10⁶ — the geo_grid_join synthesis
    * idiom (Geo.coord), reproduced bit-for-bit by the oracle.
    */
  private val World = 1000000L
  private def coord(salt: String, key: Column): Column =
    pmod(conv(substr(md5(concat(lit(salt), key.cast("string"))), lit(1), lit(8)),
      16, 10).cast("long"), lit(World))
  private def coordSql(salt: String, key: String): String =
    s"CAST(CAST(concat('0x', substr(md5('$salt' || CAST($key AS VARCHAR)), 1, 8)) AS BIGINT) % $World AS BIGINT)"

  private def dsum(c: Column, out: String): Column =
    sum(c.cast("decimal(38,0)")).cast("double").as(out)

  /** k-means, k = 4, THREE unrolled Lloyd iterations over synthetic
    * 2-D integer customer coordinates. Deterministic end to end:
    * seeds are the 4 smallest custkeys' points; assignment is argmin
    * of the exact-chain squared distance with centroid-id tiebreak
    * (min over struct(d2, k) — d2 doubles are bit-identical across
    * engines because the (x−cx)²+(y−cy)² chain is fixed-order IEEE on
    * exactly-cast inputs); new centroids are DECIMAL-exact coordinate
    * sums divided once. The oracle unrolls the same three rounds as
    * CTEs. Emitted per cluster: size, centroid, and within-cluster
    * SS per axis via the moment identity Σx² − (Σx)²/n (no second
    * pass, no order-dependent double summation).
    *
    * Scale: each round is one broadcast of 4 centroid rows against
    * the point set + one keyed aggregation — no shuffle of the
    * points beyond the aggregation, same plan at any corpus size.
    */
  def kmeans(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables(s, dir, "customer").select(col("c_custkey").as("cid"),
      coord("kx:", col("c_custkey")).as("x"),
      coord("ky:", col("c_custkey")).as("y"))
    val seeds = pts.orderBy(col("cid")).limit(4)
      .select((row_number().over(Window.orderBy(col("cid"))) - 1)
        .cast("long").as("k"),
        col("x").cast("double").as("cx"), col("y").cast("double").as("cy"))
    def assign(cents: DataFrame): DataFrame =
      pts.withColumn("xd", col("x").cast("double"))
        .withColumn("yd", col("y").cast("double"))
        .crossJoin(broadcast(cents.select(col("k"), col("cx"), col("cy"))))
        .withColumn("d2",
          (col("xd") - col("cx")) * (col("xd") - col("cx")) +
            (col("yd") - col("cy")) * (col("yd") - col("cy")))
        .groupBy(col("cid"), col("x"), col("y"))
        .agg(min(struct(col("d2"), col("k"))).as("b"))
        .select(col("cid"), col("x"), col("y"), col("b.k").as("k"))
    def stats(a: DataFrame): DataFrame = a.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        dsum(col("x"), "sx"), dsum(col("y"), "sy"),
        dsum(col("x") * col("x"), "sxx"), dsum(col("y") * col("y"), "syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("cx", col("sx") / col("nd"))
      .withColumn("cy", col("sy") / col("nd"))
    val c1 = stats(assign(seeds))
    val c2 = stats(assign(c1))
    stats(assign(c2))
      .select(col("k"), col("n"), col("cx"), col("cy"),
        (col("sxx") - col("sx") * col("sx") / col("nd")).as("wcss_x"),
        (col("syy") - col("sy") * col("sy") / col("nd")).as("wcss_y"))
      .orderBy(col("k"))
  }

  val kmeansSql: String = {
    val x = coordSql("kx:", "c_custkey")
    val y = coordSql("ky:", "c_custkey")
    def assign(cents: String, out: String): String =
      s"""$out AS (SELECT cid, x, y, k FROM (
         |  SELECT p.cid, p.x, p.y, s.k, ROW_NUMBER() OVER (
         |    PARTITION BY p.cid ORDER BY
         |      (CAST(p.x AS DOUBLE) - s.cx) * (CAST(p.x AS DOUBLE) - s.cx)
         |      + (CAST(p.y AS DOUBLE) - s.cy) * (CAST(p.y AS DOUBLE) - s.cy),
         |      s.k) AS rn
         |  FROM p CROSS JOIN $cents s) WHERE rn = 1)""".stripMargin
    def cent(a: String, out: String): String =
      s"""$out AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) AS DOUBLE) AS nd,
         |  CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         |  CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         |  CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         |  CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         |  CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS cx,
         |  CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS cy
         |  FROM $a GROUP BY k)""".stripMargin
    s"""WITH p AS (SELECT c_custkey AS cid, $x AS x, $y AS y FROM customer),
       |s0 AS (SELECT (ROW_NUMBER() OVER (ORDER BY cid)) - 1 AS k,
       |    CAST(x AS DOUBLE) AS cx, CAST(y AS DOUBLE) AS cy
       |  FROM (SELECT * FROM p ORDER BY cid LIMIT 4)),
       |${assign("s0", "a1")},
       |${cent("a1", "c1")},
       |${assign("c1", "a2")},
       |${cent("a2", "c2")},
       |${assign("c2", "a3")},
       |${cent("a3", "c3")}
       |SELECT k, n, cx, cy,
       |  sxx - sx * sx / nd AS wcss_x,
       |  syy - sy * sy / nd AS wcss_y
       |FROM c3 ORDER BY k""".stripMargin
  }

  /** 2-feature PCA by the closed-form 2×2 eigen decomposition of the
    * sample covariance of (account-balance cents, lifetime spend
    * cents) per customer: λ = (a+c)/2 ± √(((a−c)/2)² + b²), explained
    * variance ratio λ₁/(a+c), unnormalized first eigenvector
    * (b, λ₁−a). √ is the only non-arithmetic op — correctly rounded
    * in IEEE 754, so both engines agree bitwise. One aggregation row.
    */
  def pca(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")
        .cast("decimal(38,0)")).cast("long").as("v"))
    val uv = Tables(s, dir, "customer")
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(round(col("c_acctbal") * 100.0).cast("long").as("u"),
        coalesce(col("v"), lit(0L)).as("v"))
    uv.agg(count(lit(1)).as("n"),
        dsum(col("u"), "su"), dsum(col("v"), "sv"),
        dsum(col("u") * col("u"), "suu"), dsum(col("u") * col("v"), "suv"),
        dsum(col("v") * col("v"), "svv"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("a",
        (col("suu") - col("su") * col("su") / col("nd")) / (col("nd") - 1.0))
      .withColumn("b",
        (col("suv") - col("su") * col("sv") / col("nd")) / (col("nd") - 1.0))
      .withColumn("c",
        (col("svv") - col("sv") * col("sv") / col("nd")) / (col("nd") - 1.0))
      .withColumn("r", sqrt((col("a") - col("c")) / 2.0 * ((col("a") - col("c")) / 2.0)
        + col("b") * col("b")))
      .withColumn("l1", (col("a") + col("c")) / 2.0 + col("r"))
      .withColumn("l2", (col("a") + col("c")) / 2.0 - col("r"))
      .select(col("n"), col("a").as("var_u"), col("b").as("cov_uv"),
        col("c").as("var_v"), col("l1"), col("l2"),
        when(col("a") + col("c") =!= 0.0, col("l1") / (col("a") + col("c")))
          .as("evr"),
        col("b").as("eig_x"), (col("l1") - col("a")).as("eig_y"))
  }

  val pcaSql: String =
    """WITH spend AS (SELECT o_custkey,
      |    CAST(SUM(CAST(CAST(round(o_totalprice * 100.0e0) AS BIGINT)
      |      AS DECIMAL(38,0))) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |uv AS (SELECT CAST(round(c_acctbal * 100.0e0) AS BIGINT) AS u,
      |    COALESCE(v, 0) AS v
      |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS DOUBLE) AS nd,
      |    CAST(SUM(CAST(u AS DECIMAL(38,0))) AS DOUBLE) AS su,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS sv,
      |    CAST(SUM(CAST(u * u AS DECIMAL(38,0))) AS DOUBLE) AS suu,
      |    CAST(SUM(CAST(u * v AS DECIMAL(38,0))) AS DOUBLE) AS suv,
      |    CAST(SUM(CAST(v * v AS DECIMAL(38,0))) AS DOUBLE) AS svv
      |  FROM uv),
      |cv AS (SELECT n, nd,
      |    (suu - su * su / nd) / (nd - 1.0e0) AS a,
      |    (suv - su * sv / nd) / (nd - 1.0e0) AS b,
      |    (svv - sv * sv / nd) / (nd - 1.0e0) AS c
      |  FROM m),
      |e AS (SELECT *, sqrt((a - c) / 2.0e0 * ((a - c) / 2.0e0) + b * b) AS r
      |  FROM cv)
      |SELECT n, a AS var_u, b AS cov_uv, c AS var_v,
      |  (a + c) / 2.0e0 + r AS l1, (a + c) / 2.0e0 - r AS l2,
      |  CASE WHEN a + c <> 0.0e0
      |    THEN ((a + c) / 2.0e0 + r) / (a + c) END AS evr,
      |  b AS eig_x, ((a + c) / 2.0e0 + r) - a AS eig_y
      |FROM e""".stripMargin

  /** Ridge-regression regularization path: order total cents ~ item
    * count + customer balance cents, solved in closed form for
    * λ ∈ {0, 10⁸, 10¹²} by Cramer's rule on the damped normal matrix
    * (XᵀX + λ·diag(0,1,1) — the intercept is never penalized). λ = 0
    * is exactly OLS; the two positive λ rows show the coefficient
    * shrinkage an ML feature pipeline inspects before picking a
    * regularizer. Ten exact DECIMAL moments, one cast each, then a
    * per-λ fixed IEEE chain — three rows out of one aggregation.
    */
  def ridge(s: SparkSession, dir: String): DataFrame = {
    val items = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("x1"))
    val j = Tables(s, dir, "orders")
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(round(col("o_totalprice") * 100.0).cast("long").as("y"),
        col("x1"), round(col("c_acctbal") * 100.0).cast("long").as("x2"))
    val m = j.agg(count(lit(1)).cast("double").as("n"),
      dsum(col("x1"), "s1"), dsum(col("x2"), "s2"), dsum(col("y"), "sy"),
      dsum(col("x1") * col("x1"), "s11"), dsum(col("x1") * col("x2"), "s12"),
      dsum(col("x2") * col("x2"), "s22"), dsum(col("x1") * col("y"), "s1y"),
      dsum(col("x2") * col("y"), "s2y"))
    m.select(col("*"), explode(array(lit(0.0), lit(1.0e8), lit(1.0e12))).as("lam"))
      .withColumn("q11", col("s11") + col("lam"))
      .withColumn("q22", col("s22") + col("lam"))
      .withColumn("det",
        col("n") * (col("q11") * col("q22") - col("s12") * col("s12")) -
          col("s1") * (col("s1") * col("q22") - col("s12") * col("s2")) +
          col("s2") * (col("s1") * col("s12") - col("q11") * col("s2")))
      .withColumn("b0", when(col("det") =!= 0.0,
        (col("sy") * (col("q11") * col("q22") - col("s12") * col("s12")) -
          col("s1") * (col("s1y") * col("q22") - col("s12") * col("s2y")) +
          col("s2") * (col("s1y") * col("s12") - col("q11") * col("s2y")))
          / col("det")))
      .withColumn("b1", when(col("det") =!= 0.0,
        (col("n") * (col("s1y") * col("q22") - col("s12") * col("s2y")) -
          col("sy") * (col("s1") * col("q22") - col("s12") * col("s2")) +
          col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2")))
          / col("det")))
      .withColumn("b2", when(col("det") =!= 0.0,
        (col("n") * (col("q11") * col("s2y") - col("s1y") * col("s12")) -
          col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
          col("sy") * (col("s1") * col("s12") - col("q11") * col("s2")))
          / col("det")))
      .select(col("lam"), col("n").cast("long").as("n"),
        col("b0"), col("b1"), col("b2"))
      .orderBy(col("lam"))
  }

  val ridgeSql: String =
    """WITH items AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x1
      |  FROM lineitem GROUP BY 1),
      |j AS (SELECT CAST(round(o_totalprice * 100.0e0) AS BIGINT) AS y,
      |    x1, CAST(round(c_acctbal * 100.0e0) AS BIGINT) AS x2
      |  FROM orders JOIN items ON o_orderkey = l_orderkey
      |  JOIN customer ON o_custkey = c_custkey),
      |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
      |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE) AS s11,
      |    CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS s12,
      |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS s22,
      |    CAST(SUM(CAST(x1 * y AS DECIMAL(38,0))) AS DOUBLE) AS s1y,
      |    CAST(SUM(CAST(x2 * y AS DECIMAL(38,0))) AS DOUBLE) AS s2y
      |  FROM j),
      |lamb AS (SELECT m.*, l.lam
      |  FROM m CROSS JOIN (SELECT unnest([0.0e0, 1.0e8, 1.0e12]) AS lam) l),
      |d AS (SELECT *, s11 + lam AS q11, s22 + lam AS q22 FROM lamb),
      |dd AS (SELECT *,
      |    n * (q11 * q22 - s12 * s12) - s1 * (s1 * q22 - s12 * s2)
      |      + s2 * (s1 * s12 - q11 * s2) AS det
      |  FROM d)
      |SELECT lam, CAST(n AS BIGINT) AS n,
      |  CASE WHEN det <> 0.0e0 THEN
      |    (sy * (q11 * q22 - s12 * s12) - s1 * (s1y * q22 - s12 * s2y)
      |      + s2 * (s1y * s12 - q11 * s2y)) / det END AS b0,
      |  CASE WHEN det <> 0.0e0 THEN
      |    (n * (s1y * q22 - s12 * s2y) - sy * (s1 * q22 - s12 * s2)
      |      + s2 * (s1 * s2y - s1y * s2)) / det END AS b1,
      |  CASE WHEN det <> 0.0e0 THEN
      |    (n * (q11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      |      + sy * (s1 * s12 - q11 * s2)) / det END AS b2
      |FROM dd ORDER BY lam""".stripMargin

  /** Mahalanobis-distance outlier audit over orders: 2-D feature
    * (total cents, item count) against the order-priority group's
    * closed-form 2×2 population covariance — d² = (dx²·c22 −
    * 2·dx·dy·c12 + dy²·c11)/det, flagging d² > 12 (≈ χ²₂ 99.75%).
    * The multivariate step up from the univariate z-score/MAD
    * outlier queries: a (price, size) pair can be jointly anomalous
    * while each margin looks normal. Degenerate groups (det ≤ 0)
    * emit nothing. One aggregation over orders, 5 moment rows
    * broadcast back — no window, no sort.
    */
  def mahalanobis(s: SparkSession, dir: String): DataFrame = {
    val items = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y2"))
    val base = Tables(s, dir, "orders")
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100.0).cast("long").as("y1"), col("y2"))
    val m = base.groupBy(col("prio"))
      .agg(count(lit(1)).cast("double").as("nd"),
        dsum(col("y1"), "s1"), dsum(col("y2"), "s2"),
        dsum(col("y1") * col("y1"), "s11"), dsum(col("y1") * col("y2"), "s12"),
        dsum(col("y2") * col("y2"), "s22"))
      .withColumn("mu1", col("s1") / col("nd"))
      .withColumn("mu2", col("s2") / col("nd"))
      .withColumn("c11", col("s11") / col("nd") - col("mu1") * col("mu1"))
      .withColumn("c12", col("s12") / col("nd") - col("mu1") * col("mu2"))
      .withColumn("c22", col("s22") / col("nd") - col("mu2") * col("mu2"))
      .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
      .select(col("prio"), col("mu1"), col("mu2"),
        col("c11"), col("c12"), col("c22"), col("det"))
    base.join(broadcast(m), "prio")
      .filter(col("det") > 0.0)
      .withColumn("dx", col("y1").cast("double") - col("mu1"))
      .withColumn("dy", col("y2").cast("double") - col("mu2"))
      .withColumn("d2",
        (col("dx") * col("dx") * col("c22") -
          lit(2.0) * col("dx") * col("dy") * col("c12") +
          col("dy") * col("dy") * col("c11")) / col("det"))
      .filter(col("d2") > 12.0)
      .select(col("o_orderkey"), col("prio"), col("y1").as("cents"),
        col("y2").as("n_items"), col("d2"))
      .orderBy(col("o_orderkey"))
  }

  val mahalanobisSql: String =
    """WITH items AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS y2
      |  FROM lineitem GROUP BY 1),
      |base AS (SELECT o_orderkey, o_orderpriority AS prio,
      |    CAST(round(o_totalprice * 100.0e0) AS BIGINT) AS y1, y2
      |  FROM orders JOIN items ON o_orderkey = l_orderkey),
      |m0 AS (SELECT prio, CAST(COUNT(*) AS DOUBLE) AS nd,
      |    CAST(SUM(CAST(y1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(y2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
      |    CAST(SUM(CAST(y1 * y1 AS DECIMAL(38,0))) AS DOUBLE) AS s11,
      |    CAST(SUM(CAST(y1 * y2 AS DECIMAL(38,0))) AS DOUBLE) AS s12,
      |    CAST(SUM(CAST(y2 * y2 AS DECIMAL(38,0))) AS DOUBLE) AS s22
      |  FROM base GROUP BY 1),
      |m1 AS (SELECT prio, s1 / nd AS mu1, s2 / nd AS mu2,
      |    s11 / nd - (s1 / nd) * (s1 / nd) AS c11,
      |    s12 / nd - (s1 / nd) * (s2 / nd) AS c12,
      |    s22 / nd - (s2 / nd) * (s2 / nd) AS c22
      |  FROM m0),
      |m AS (SELECT *, c11 * c22 - c12 * c12 AS det FROM m1),
      |d AS (SELECT b.o_orderkey, b.prio, b.y1, b.y2,
      |    CAST(b.y1 AS DOUBLE) - m.mu1 AS dx,
      |    CAST(b.y2 AS DOUBLE) - m.mu2 AS dy,
      |    m.c11, m.c12, m.c22, m.det
      |  FROM base b JOIN m USING (prio) WHERE m.det > 0.0e0)
      |SELECT o_orderkey, prio, y1 AS cents, y2 AS n_items,
      |  (dx * dx * c22 - 2.0e0 * dx * dy * c12 + dy * dy * c11) / det AS d2
      |FROM d
      |WHERE (dx * dx * c22 - 2.0e0 * dx * dy * c12 + dy * dy * c11) / det
      |  > 12.0e0
      |ORDER BY o_orderkey""".stripMargin

  /** Fisher's linear discriminant (Fisher 1936) as a closed-form
    * 2-feature Gaussian LDA: class = order is fully shipped
    * (o_orderstatus 'F'), features = total price cents and order-date
    * epoch-day. Class means and the POOLED within-class covariance
    * come from one aggregation's exact DECIMAL moments (Σx, Σx²,
    * Σxy per class via the shift identity — order-free); the 2×2
    * inverse is Cramer's rule, w = S⁻¹(μ₁−μ₀), threshold =
    * w·(μ₀+μ₁)/2 — every double produced by one cast and consumed in
    * a fixed chain. A second pass scores each order (w·x > thr —
    * per-row fixed chain on exactly-cast integers) and reports the
    * confusion matrix + accuracy; degenerate inputs (a class with
    * n ≤ 1, singular pooled covariance) emit NULL weights and NULL
    * accuracy, never a divide-by-zero.
    *
    * Scale: TWO corpus scans (moments, then scoring against the
    * broadcast 1-row model) — both map-side-combinable aggregations,
    * no join, no window, the eval_ece train/apply shape.
    */
  def lda(s: SparkSession, dir: String): DataFrame = {
    def base(ss: SparkSession) = Tables(ss, dir, "orders")
      .select(when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        round(col("o_totalprice")).cast("long").as("x1"),
        (expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000")
          - lit(8035L)).as("x2"))
    val b = base(s)
    def cls(y: Int, c: Column): Column = when(col("y") === y, c)
    def moments(y: Int, p: String) = Seq(
      count(cls(y, lit(1))).cast("double").as(s"n$p"),
      dsum(cls(y, col("x1")), s"s1$p"), dsum(cls(y, col("x2")), s"s2$p"),
      dsum(cls(y, col("x1") * col("x1")), s"s11$p"),
      dsum(cls(y, col("x1") * col("x2")), s"s12$p"),
      dsum(cls(y, col("x2") * col("x2")), s"s22$p"))
    val m = b.agg((moments(0, "a") ++ moments(1, "b")).head,
        (moments(0, "a") ++ moments(1, "b")).tail: _*)
      .withColumn("mxa", col("s1a") / col("na"))
      .withColumn("mya", col("s2a") / col("na"))
      .withColumn("mxb", col("s1b") / col("nb"))
      .withColumn("myb", col("s2b") / col("nb"))
      .withColumn("p11", (col("s11a") - col("s1a") * col("s1a") / col("na") +
        (col("s11b") - col("s1b") * col("s1b") / col("nb"))) /
        (col("na") + col("nb") - lit(2.0)))
      .withColumn("p12", (col("s12a") - col("s1a") * col("s2a") / col("na") +
        (col("s12b") - col("s1b") * col("s2b") / col("nb"))) /
        (col("na") + col("nb") - lit(2.0)))
      .withColumn("p22", (col("s22a") - col("s2a") * col("s2a") / col("na") +
        (col("s22b") - col("s2b") * col("s2b") / col("nb"))) /
        (col("na") + col("nb") - lit(2.0)))
      .withColumn("d1", col("mxb") - col("mxa"))
      .withColumn("d2", col("myb") - col("mya"))
      .withColumn("det", col("p11") * col("p22") - col("p12") * col("p12"))
      .withColumn("ok", col("na") > 1.0 && col("nb") > 1.0 && col("det") =!= 0.0)
      .withColumn("w1", when(col("ok"),
        (col("p22") * col("d1") - col("p12") * col("d2")) / col("det")))
      .withColumn("w2", when(col("ok"),
        (col("p11") * col("d2") - col("p12") * col("d1")) / col("det")))
      .withColumn("thr", when(col("ok"),
        (col("w1") * (col("mxa") + col("mxb")) +
          col("w2") * (col("mya") + col("myb"))) / lit(2.0)))
    val model = broadcast(m.select(col("na"), col("nb"), col("mxa"), col("mya"),
      col("mxb"), col("myb"), col("w1"), col("w2"), col("thr")))
    base(s).crossJoin(model)
      .withColumn("pred", when(col("w1").isNotNull,
        (col("w1") * col("x1").cast("double") +
          col("w2") * col("x2").cast("double") > col("thr")).cast("long")))
      .groupBy(col("na"), col("nb"), col("mxa"), col("mya"), col("mxb"),
        col("myb"), col("w1"), col("w2"), col("thr"))
      .agg(sum(when(col("pred") === 1L && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") === 1L && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(col("pred") === 0L && col("y") === 0L, 1L).otherwise(0L)).as("tn"),
        sum(when(col("pred") === 0L && col("y") === 1L, 1L).otherwise(0L)).as("fn"))
      .withColumn("accuracy", when(col("w1").isNotNull,
        (col("tp") + col("tn")).cast("double") /
          (col("tp") + col("tn") + col("fp") + col("fn")).cast("double")))
      .select(col("na").cast("long").as("n_other"),
        col("nb").cast("long").as("n_shipped"),
        col("mxa"), col("mya"), col("mxb"), col("myb"),
        col("w1"), col("w2"), col("thr"),
        col("tp"), col("fp"), col("tn"), col("fn"), col("accuracy"))
  }

  val ldaSql: String =
    """WITH b AS (SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |    CAST(round(o_totalprice) AS BIGINT) AS x1,
      |    epoch_ms(o_orderdate) // 86400000 - 8035 AS x2
      |  FROM orders),
      |m0 AS (SELECT
      |    CAST(COUNT(CASE WHEN y = 0 THEN 1 END) AS DOUBLE) AS na,
      |    CAST(SUM(CASE WHEN y = 0 THEN CAST(x1 AS HUGEINT) END) AS DOUBLE) AS s1a,
      |    CAST(SUM(CASE WHEN y = 0 THEN CAST(x2 AS HUGEINT) END) AS DOUBLE) AS s2a,
      |    CAST(SUM(CASE WHEN y = 0 THEN CAST(x1 AS HUGEINT) * x1 END) AS DOUBLE) AS s11a,
      |    CAST(SUM(CASE WHEN y = 0 THEN CAST(x1 AS HUGEINT) * x2 END) AS DOUBLE) AS s12a,
      |    CAST(SUM(CASE WHEN y = 0 THEN CAST(x2 AS HUGEINT) * x2 END) AS DOUBLE) AS s22a,
      |    CAST(COUNT(CASE WHEN y = 1 THEN 1 END) AS DOUBLE) AS nb,
      |    CAST(SUM(CASE WHEN y = 1 THEN CAST(x1 AS HUGEINT) END) AS DOUBLE) AS s1b,
      |    CAST(SUM(CASE WHEN y = 1 THEN CAST(x2 AS HUGEINT) END) AS DOUBLE) AS s2b,
      |    CAST(SUM(CASE WHEN y = 1 THEN CAST(x1 AS HUGEINT) * x1 END) AS DOUBLE) AS s11b,
      |    CAST(SUM(CASE WHEN y = 1 THEN CAST(x1 AS HUGEINT) * x2 END) AS DOUBLE) AS s12b,
      |    CAST(SUM(CASE WHEN y = 1 THEN CAST(x2 AS HUGEINT) * x2 END) AS DOUBLE) AS s22b
      |  FROM b),
      |mm AS (SELECT *, s1a / na AS mxa, s2a / na AS mya,
      |    s1b / nb AS mxb, s2b / nb AS myb,
      |    (s11a - s1a * s1a / na + (s11b - s1b * s1b / nb)) / (na + nb - 2.0e0) AS p11,
      |    (s12a - s1a * s2a / na + (s12b - s1b * s2b / nb)) / (na + nb - 2.0e0) AS p12,
      |    (s22a - s2a * s2a / na + (s22b - s2b * s2b / nb)) / (na + nb - 2.0e0) AS p22
      |  FROM m0),
      |dd AS (SELECT *, mxb - mxa AS d1, myb - mya AS d2,
      |    p11 * p22 - p12 * p12 AS det,
      |    (na > 1.0e0 AND nb > 1.0e0 AND p11 * p22 - p12 * p12 <> 0.0e0) AS ok
      |  FROM mm),
      |ww AS (SELECT *,
      |    CASE WHEN ok THEN (p22 * d1 - p12 * d2) / det END AS w1,
      |    CASE WHEN ok THEN (p11 * d2 - p12 * d1) / det END AS w2
      |  FROM dd),
      |mdl AS (SELECT *, CASE WHEN ok THEN
      |    (w1 * (mxa + mxb) + w2 * (mya + myb)) / 2.0e0 END AS thr
      |  FROM ww),
      |sc AS (SELECT b.y, CASE WHEN mdl.w1 IS NOT NULL THEN
      |    CAST(mdl.w1 * CAST(b.x1 AS DOUBLE)
      |      + mdl.w2 * CAST(b.x2 AS DOUBLE) > mdl.thr AS BIGINT) END AS pred,
      |    mdl.na, mdl.nb, mdl.mxa, mdl.mya, mdl.mxb, mdl.myb,
      |    mdl.w1, mdl.w2, mdl.thr
      |  FROM b CROSS JOIN mdl),
      |cf AS (SELECT na, nb, mxa, mya, mxb, myb, w1, w2, thr,
      |    CAST(SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      |    CAST(SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      |  FROM sc GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9)
      |SELECT CAST(na AS BIGINT) AS n_other, CAST(nb AS BIGINT) AS n_shipped,
      |  mxa, mya, mxb, myb, w1, w2, thr, tp, fp, tn, fn,
      |  CASE WHEN w1 IS NOT NULL THEN CAST(tp + tn AS DOUBLE)
      |    / CAST(tp + tn + fp + fn AS DOUBLE) END AS accuracy
      |FROM cf""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_kmeans" -> (kmeans _),
    "ml_pca" -> (pca _),
    "ml_ridge" -> (ridge _),
    "ml_lda" -> (lda _),
    "dq_mahalanobis" -> (mahalanobis _))

  val oracles: Map[String, String] = Map(
    "ml_kmeans" -> kmeansSql,
    "ml_pca" -> pcaSql,
    "ml_ridge" -> ridgeSql,
    "ml_lda" -> ldaSql,
    "dq_mahalanobis" -> mahalanobisSql)
}
