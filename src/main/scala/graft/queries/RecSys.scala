package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Collaborative-filtering model training as a certified query:
  * alternating least squares (Koren/Bell/Volinsky 2009; Zhou et al.
  * 2008) on the customer×part purchase matrix, rank 2, ridge λ=0.1 —
  * the `text_bpe_train` / `sim_ivf_t` convention taken to its logical
  * end: the TRAINING LOOP ITSELF is replayed by the DuckDB oracle, so
  * the learned factors hash bit-exactly cross-engine.
  *
  * Determinism: item factors initialize from md5 of the item id
  * (salted-hash, no RNG); each ALS solve is a 5-slot
  * `[a11, a12, a22, b1, b2]` DOUBLE-list fold over the entity's
  * ratings IN COUNTERPART-KEY ORDER, closed by the 2×2 Cramer
  * inverse — a fixed IEEE chain. Two user solves with an item solve
  * between (p¹ ← q⁰, q¹ ← p¹, p² ← q¹), then a per-user training SSE
  * fold. Every stage is one keyed aggregation + one equi-join — the
  * genuine distributed-ALS dataflow (factors co-partition with
  * ratings by the solving side's key at any scale).
  */
object RecSys {

  private val Lambda = 0.1

  /** ratings (u, i, r): per customer×part summed quantities. */
  private def ratings(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("i"),
        col("l_quantity").cast("long").as("q"))
    val ords = Tables(s, dir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("u"))
    li.join(ords, "ok")
      .groupBy(col("u"), col("i"))
      .agg(sum(col("q")).cast("double").as("r"))
  }

  /** Seeded factor for key k, component c: 0.5 + (md5 mod 1000)/2000 ∈
    * [0.5, 1) — positive and bounded away from 0 so the first solves
    * are well-conditioned.
    */
  private def seed(k: Column, c: Int): Column =
    lit(0.5) + (pmod(conv(substring(md5(concat(k.cast("string"), lit(s":$c"))),
      1, 8), 16, 10).cast("long"), lit(1000L)).cast("double") / lit(2000.0))

  /** One ALS half-step: solve factors for `key` from counterpart
    * factors (f1, f2) joined onto the ratings. Fold runs in `other`
    * order; ridge on the diagonal via the fold init.
    */
  private def solveFor(rat: DataFrame, key: String, other: String): DataFrame = {
    // r13: explicit full-width exchange on the solve key (user-
    // specified counts are AQE-coalesce-exempt) — each solve's collect
    // aggregation otherwise ran at the ~6 tasks AQE coalesced the
    // ~7 MB factor join to (profiled: 200-300 ms per solve stage at
    // sf0.1, 32 cores). groupBy reuses the partitioning, so no extra
    // exchange enters the plan; at scale the exchange replaces the
    // aggregation's own same-key exchange, not adds to it.
    val w = rat.sparkSession.sparkContext.defaultParallelism
    val arr = rat.repartition(w, col(key)).groupBy(col(key))
      .agg(sort_array(collect_list(struct(col(other).as("o"),
        col("f1"), col("f2"), col("r")))).as("xs"))
    arr.withColumn("s", aggregate(col("xs"),
        array(lit(Lambda), lit(0.0), lit(Lambda), lit(0.0), lit(0.0)),
        (acc, x) => {
          val (q1, q2, r) = (x.getField("f1"), x.getField("f2"), x.getField("r"))
          array(
            element_at(acc, 1) + q1 * q1,
            element_at(acc, 2) + q1 * q2,
            element_at(acc, 3) + q2 * q2,
            element_at(acc, 4) + r * q1,
            element_at(acc, 5) + r * q2)
        }))
      .withColumn("det",
        element_at(col("s"), 1) * element_at(col("s"), 3) -
          element_at(col("s"), 2) * element_at(col("s"), 2))
      .select(col(key),
        ((element_at(col("s"), 3) * element_at(col("s"), 4) -
          element_at(col("s"), 2) * element_at(col("s"), 5)) / col("det")).as("f1"),
        ((element_at(col("s"), 1) * element_at(col("s"), 5) -
          element_at(col("s"), 2) * element_at(col("s"), 4)) / col("det")).as("f2"))
  }

  /** Rank-2 ALS (q⁰ seeded → p¹ → q¹ → p²) with per-user training SSE.
    * Emits one row per customer: factors and reconstruction error.
    */
  def recAls(s: SparkSession, dir: String): DataFrame = {
    // Each half-step is MATERIALIZED once (eager localCheckpoint, the
    // distributed-ALS sweep barrier) instead of left as a plan: with
    // only `rat` cached, the single mega-plan re-evaluated the factor
    // subtrees per consumer (p1 inside q1, q1 inside p2 AND the final
    // join, p2 again inside it — 23 distinct static shuffles where the
    // dataflow has ~12), and exchange reuse recovered only part of it
    // (r11 measured: mega-plan 5.8–6.0 s min-of-3 at sf0.1; staged
    // checkpoints 4.2 s min-of-3 on a slower machine state). A checkpointed
    // stage also decouples the bench timing from cache-manager state —
    // every run pays the same four jobs, so the measurement is the
    // cold cost, reproducibly. p1's blocks are freed as soon as q1 is
    // solid (the attribution_markov recipe); rat/q1/p2 stay pinned for
    // the final SSE join and die in the caller's sweep.
    val rat = ratings(s, dir).localCheckpoint(true) // consumed by 4 stages
    val q0 = rat.select(col("i")).distinct()
      .select(col("i"), seed(col("i"), 1).as("f1"), seed(col("i"), 2).as("f2"))
    val p1 = solveFor(rat.join(q0, "i"), "u", "i").localCheckpoint(true)
    val q1 = solveFor(rat.join(p1, "u"), "i", "u").localCheckpoint(true)
    graft.Caches.free(p1) // q1 materialized — p1's blocks are dead weight
    val p2 = solveFor(rat.join(q1, "i"), "u", "i").localCheckpoint(true)
    val joined = rat.join(q1, "i")
      .join(p2.select(col("u"), col("f1").as("p1"), col("f2").as("p2")), "u")
    joined.groupBy(col("u"))
      .agg(count(lit(1)).as("n_items"),
        max(col("p1")).as("p1"), max(col("p2")).as("p2"),
        sort_array(collect_list(struct(col("i"), col("f1"), col("f2"),
          col("r"), col("p1").as("pp1"), col("p2").as("pp2")))).as("xs"))
      .withColumn("sse", aggregate(col("xs"), lit(0.0), (a, x) => {
        val e = x.getField("r") -
          (x.getField("pp1") * x.getField("f1") +
            x.getField("pp2") * x.getField("f2"))
        a + e * e
      }))
      .select(col("u").as("custkey"), col("n_items"),
        col("p1"), col("p2"), col("sse"))
      .orderBy(col("custkey"))
  }

  val recAlsSql: String = {
    def seedS(k: String, c: Int): String =
      s"0.5e0 + (CAST(CAST(concat('0x', substr(md5(CAST($k AS VARCHAR) || ':$c'), 1, 8)) AS BIGINT) " +
        s"% 1000 AS DOUBLE) / 2000.0e0)"
    // one ALS half-step as SQL: group `src` by key, fold 5 sums, Cramer
    def solveS(src: String, key: String, other: String): String =
      s"""SELECT $key, (s[3] * s[4] - s[2] * s[5]) / (s[1] * s[3] - s[2] * s[2]) AS f1,
         |    (s[1] * s[5] - s[2] * s[4]) / (s[1] * s[3] - s[2] * s[2]) AS f2
         |  FROM (SELECT $key, list_reduce(list_prepend(
         |      [0.1e0, 0.0e0, 0.1e0, 0.0e0, 0.0e0]::DOUBLE[],
         |      list_transform(list(struct_pack(o := $other, q1 := f1, q2 := f2, r := r)
         |          ORDER BY $other),
         |        x -> [x.q1, x.q2, x.r, 0.0e0, 0.0e0]::DOUBLE[])),
         |    (acc, x) -> [acc[1] + x[1] * x[1], acc[2] + x[1] * x[2],
         |      acc[3] + x[2] * x[2], acc[4] + x[3] * x[1],
         |      acc[5] + x[3] * x[2]]::DOUBLE[]) AS s
         |  FROM $src GROUP BY $key)""".stripMargin
    s"""WITH rat AS (SELECT o.o_custkey AS u, l.l_partkey AS i,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS r
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2),
       |q0 AS (SELECT i, ${seedS("i", 1)} AS f1, ${seedS("i", 2)} AS f2
       |  FROM (SELECT DISTINCT i FROM rat)),
       |p1 AS (${solveS("(SELECT rat.*, q0.f1, q0.f2 FROM rat JOIN q0 USING (i))", "u", "i")}),
       |q1 AS (${solveS("(SELECT rat.*, p1.f1, p1.f2 FROM rat JOIN p1 USING (u))", "i", "u")}),
       |p2 AS (${solveS("(SELECT rat.*, q1.f1, q1.f2 FROM rat JOIN q1 USING (i))", "u", "i")}),
       |j AS (SELECT rat.u, rat.i, rat.r, q1.f1, q1.f2, p2.f1 AS pp1, p2.f2 AS pp2
       |  FROM rat JOIN q1 USING (i) JOIN p2 USING (u))
       |SELECT u AS custkey, CAST(COUNT(*) AS BIGINT) AS n_items,
       |  MAX(pp1) AS p1, MAX(pp2) AS p2,
       |  list_reduce(list_prepend(0.0e0,
       |    list_transform(list(struct_pack(i := i, f1 := f1, f2 := f2, r := r,
       |        pp1 := pp1, pp2 := pp2) ORDER BY i),
       |      x -> (x.r - (x.pp1 * x.f1 + x.pp2 * x.f2))
       |        * (x.r - (x.pp1 * x.f1 + x.pp2 * x.f2)))),
       |    (a, v) -> a + v) AS sse
       |FROM j GROUP BY u ORDER BY custkey""".stripMargin
  }

  /** Weighted Slope One (Lemire & Maclachlan 2005) scoped to order
    * baskets: item-pair rating deviations dev(j,i) = avg(r_j − r_i)
    * over orders containing both parts, then a leave-the-target-out
    * prediction of every observed (order, part) quantity from the
    * order's other parts, weighted by pair support. Emits per-part
    * prediction count and SSE. Pair expansion runs INSIDE order
    * baskets (≤7 parts in TPC-H), so candidates stay linear in
    * orders at any scale; deviations are exact int/int divisions and
    * every double sum is a keyed sequential fold (counterpart-key
    * order), replayed verbatim by the oracle.
    */
  def recSlopeOne(s: SparkSession, dir: String): DataFrame = {
    val rat = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("i"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("ok"), col("i")).agg(sum(col("q")).as("r"))
    // r12: with the deviation attached as a window (below), the pair
    // expansion has exactly ONE consumer, so the r11 staging checkpoint
    // became pure overhead (a 92 MB block write + re-read per run) and
    // is dropped; the rat self-join's two branches share one exchange
    // (ReusedExchange — identical subtrees).
    val pairs = rat.select(col("ok"), col("i").as("j"), col("r").as("rj"))
      .join(rat.select(col("ok"), col("i"), col("r").as("ri")), Seq("ok"))
      .where(col("j") =!= col("i"))
    // r12: the deviation table is attached as a WINDOW over the same
    // (j, i) keys instead of a groupBy + join-back — the join shape
    // shuffled the checkpointed pair table twice (once into the dev
    // aggregation, once as the probe side; profiled 73 MB re-shuffle +
    // SMJ at sf0.1). One partitionBy(j, i) exchange now carries the
    // pairs once; count and the integer sum are order-independent, and
    // dev is the same single double division, so every emitted value is
    // bit-identical.
    val wji = org.apache.spark.sql.expressions.Window
      .partitionBy(col("j"), col("i"))
    val withDev = pairs
      .withColumn("c", count(lit(1)).over(wji))
      .withColumn("dev",
        sum(col("rj") - col("ri")).over(wji).cast("double") /
          col("c").cast("double"))
    val pred = withDev
      .groupBy(col("ok"), col("j"), col("rj"))
      .agg(sum(col("c")).as("den"),
        sort_array(collect_list(struct(col("i"), col("c"),
          col("ri"), col("dev")))).as("xs"))
      .withColumn("num", aggregate(col("xs"), lit(0.0), (a, x) =>
        a + x.getField("c").cast("double") *
          (x.getField("ri").cast("double") + x.getField("dev"))))
      .select(col("ok"), col("j"),
        (col("num") / col("den").cast("double") - col("rj").cast("double")).as("e"))
    pred.groupBy(col("j").as("partkey"))
      .agg(count(lit(1)).as("n_pred"),
        sort_array(collect_list(struct(col("ok"), col("e")))).as("es"))
      .withColumn("sse", aggregate(col("es"), lit(0.0), (a, x) =>
        a + x.getField("e") * x.getField("e")))
      .select(col("partkey"), col("n_pred"), col("sse"))
      .orderBy(col("partkey"))
  }

  val recSlopeOneSql: String =
    """WITH rat AS (SELECT l_orderkey AS ok, l_partkey AS i,
      |    SUM(CAST(l_quantity AS BIGINT)) AS r FROM lineitem GROUP BY 1, 2),
      |pairs AS (SELECT a.ok, a.i AS j, a.r AS rj, b.i, b.r AS ri
      |  FROM rat a JOIN rat b ON a.ok = b.ok AND a.i <> b.i),
      |dev AS (SELECT j, i, CAST(COUNT(*) AS BIGINT) AS c,
      |    CAST(SUM(rj - ri) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dev
      |  FROM pairs GROUP BY 1, 2),
      |pred AS (SELECT p.ok, p.j,
      |    list_reduce(list_prepend(0.0e0,
      |      list_transform(list(struct_pack(i := p.i, c := d.c, ri := p.ri,
      |          dev := d.dev) ORDER BY p.i),
      |        x -> CAST(x.c AS DOUBLE) * (CAST(x.ri AS DOUBLE) + x.dev))),
      |      (a, v) -> a + v) / CAST(SUM(d.c) AS DOUBLE)
      |      - CAST(MAX(p.rj) AS DOUBLE) AS e
      |  FROM pairs p JOIN dev d ON p.j = d.j AND p.i = d.i
      |  GROUP BY p.ok, p.j)
      |SELECT j AS partkey, CAST(COUNT(*) AS BIGINT) AS n_pred,
      |  list_reduce(list_prepend(0.0e0,
      |    list_transform(list(struct_pack(ok := ok, e := e) ORDER BY ok),
      |      x -> x.e * x.e)), (a, v) -> a + v) AS sse
      |FROM pred GROUP BY 1 ORDER BY partkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_als" -> (recAls _),
    "rec_slopeone" -> (recSlopeOne _))

  val oracles: Map[String, String] = Map(
    "rec_als" -> recAlsSql,
    "rec_slopeone" -> recSlopeOneSql)
}
