package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph-suite extensions over the event-type transition graph (the
  * same directed edge set `graph_scc`/`graph_transitions` walk):
  * exact eccentricity/reachability per node via min-plus doubling,
  * and deterministic hash-seeded random walks — the corpus generator
  * for skip-gram graph embeddings (DeepWalk/node2vec's input stage),
  * built salted-hash so the oracle replays every step choice exactly.
  *
  * Scale: both operators run on the TYPE alphabet (nodes = distinct
  * event types), so every intermediate is alphabet-bounded — the
  * corpus-scale work is the one per-user lead() window that extracts
  * transitions, identical to `graph_transitions`. Doubling rounds and
  * walk steps are compile-time constants replayed unrolled by the
  * oracle (the `graph_scc` convention); intermediates are
  * `localCheckpoint`ed so the 2^rounds plan fan-out never recomputes
  * the corpus scan, and freed per query.
  */
object GraphExtra {

  private val DoublingRounds = 3 // exact for all shortest paths ≤ 2^3 edges
  private val WalkSteps = 4

  /** Directed distinct transition edges (a≠b) from consecutive
    * same-user events, checkpointed (consumed 2^rounds times by the
    * doubling self-joins).
    */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    ev.select(col("event_type").as("a"), lead(col("event_type"), 1).over(w).as("b"))
      .filter(col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
  }

  /** Per-node eccentricity over the directed transition graph: exact
    * shortest-path distances by min-plus doubling (3 unrolled rounds —
    * exact for diameters ≤ 8, far beyond the event-type alphabet),
    * then per-source max distance and reachable count. Unreachable
    * pairs are absent, not infinite: `n_reached` says how far the
    * node sees. The graph diameter is max(ecc), the radius min(ecc) —
    * recoverable from the rows.
    */
  def graphEccentricity(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir)
    var d = e.select(col("a"), col("b"), lit(1L).as("dist"))
    val rounds = scala.collection.mutable.Buffer.empty[DataFrame]
    (1 to DoublingRounds).foreach { _ =>
      d = d.union(
          d.as("x").join(d.as("y"), col("x.b") === col("y.a"))
            .select(col("x.a").as("a"), col("y.b").as("b"),
              (col("x.dist") + col("y.dist")).as("dist")))
        .groupBy(col("a"), col("b")).agg(min(col("dist")).as("dist"))
        .filter(col("a") =!= col("b"))
        .localCheckpoint(true)
      rounds += d
    }
    val out = d.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("n_reached"), max(col("dist")).as("ecc"))
      .orderBy(col("node"))
      .localCheckpoint(true)
    graft.Caches.free(e)
    rounds.foreach(graft.Caches.free)
    out
  }

  val graphEccentricitySql: String = {
    val base =
      """ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |nx AS (SELECT event_type AS a, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts_ms, event_id) AS b FROM ev),
        |d0 AS (SELECT DISTINCT a, b, CAST(1 AS BIGINT) AS dist
        |  FROM nx WHERE b IS NOT NULL AND a <> b)""".stripMargin
    val rounds = (1 to DoublingRounds).map { i =>
      s"""d$i AS (SELECT a, b, MIN(dist) AS dist FROM (
         |    SELECT a, b, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT x.a, y.b, x.dist + y.dist FROM d${i - 1} x JOIN d${i - 1} y ON x.b = y.a)
         |  GROUP BY a, b HAVING a <> b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
       |$rounds
       |SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS n_reached,
       |  CAST(MAX(dist) AS BIGINT) AS ecc
       |FROM d$DoublingRounds GROUP BY a ORDER BY node""".stripMargin
  }

  /** Deterministic hash-seeded random walks: one 4-step walk from
    * every node, each step choosing among the current node's sorted
    * distinct out-neighbors by `md5(start:step:current) mod degree` —
    * the DeepWalk corpus generator (Perozzi et al. 2014) made
    * replayable: the oracle recomputes every choice bit-exactly, so
    * the "random" corpus is oracle-certified. Dead-end nodes emit
    * nulls from that step on. Scale: walk table is
    * (alphabet × steps); the per-step join is against the
    * alphabet-sized neighbor table — broadcastable at any corpus
    * size; longer/multiple walks per node fan out linearly.
    */
  def graphWalks(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir)
    val nbr = e.groupBy(col("a").as("u"))
      .agg(sort_array(collect_set(col("b"))).as("ns"))
      .localCheckpoint(true)
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    def hash(t: Int, cur: Column): Column =
      conv(substring(md5(concat(col("start"), lit(s":$t:"), cur)), 1, 8), 16, 10)
        .cast("long")
    var walk = nodes.select(col("node").as("start"), col("node").as("c0"))
    (1 to WalkSteps).foreach { t =>
      walk = walk.join(nbr, walk(s"c${t - 1}") === nbr("u"), "left")
        .withColumn(s"c$t",
          when(size(col("ns")) > 0,
            element_at(col("ns"),
              (pmod(hash(t, col(s"c${t - 1}")), size(col("ns")).cast("long")) + 1L)
                .cast("int"))))
        .drop("u", "ns")
    }
    val out = walk.orderBy(col("start")).localCheckpoint(true)
    graft.Caches.free(e)
    graft.Caches.free(nbr)
    out
  }

  val graphWalksSql: String = {
    val base =
      """ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |nx AS (SELECT event_type AS a, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts_ms, event_id) AS b FROM ev),
        |e AS (SELECT DISTINCT a, b FROM nx WHERE b IS NOT NULL AND a <> b),
        |nbr AS (SELECT a AS u, list(DISTINCT b ORDER BY b) AS ns FROM e GROUP BY a),
        |w0 AS (SELECT node AS start, node AS c0 FROM
        |  (SELECT a AS node FROM e UNION SELECT b FROM e))""".stripMargin
    val steps = (1 to WalkSteps).map { t =>
      s"""w$t AS (SELECT w.*, CASE WHEN len(n.ns) > 0 THEN n.ns[CAST(
         |    CAST(concat('0x', substr(md5(w.start || ':$t:' || w.c${t - 1}), 1, 8)) AS BIGINT)
         |      % CAST(len(n.ns) AS BIGINT) + 1 AS INT)] END AS c$t
         |  FROM w${t - 1} w LEFT JOIN nbr n ON w.c${t - 1} = n.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
       |$steps
       |SELECT start, c0, c1, c2, c3, c4 FROM w$WalkSteps ORDER BY start""".stripMargin
  }

  private val SimRounds = 3

  /** SimRank (Jeh & Widom 2002) over the directed transition graph:
    * "two nodes are similar if their in-neighbors are similar",
    * s(a,b) = (C/|I(a)||I(b)|)·Σ s(i,j) over in-neighbor pairs, C=0.8,
    * s(a,a)=1. Three value-iteration rounds in SCALED INTEGER
    * micro-units (the pagerank discipline): each update is one exact
    * integer Σ followed by ONE floor division (4·Σ) div (5·|I(a)|·
    * |I(b)|) — the oracle replays all rounds in unrolled CTEs.
    *
    * Scale: nodes = the event-type alphabet, so the pair table and
    * the in-neighbor-pair expansion are alphabet²/alphabet⁴-bounded —
    * corpus work is the one lead() window shared with
    * graph_transitions. The alphabet-bounded cross joins are the
    * documented exception to the no-cartesian rule.
    */
  def graphSimrank(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir) // (a, b) distinct directed
    val deg = e.groupBy(col("b").as("n")).agg(count(lit(1)).as("ind"))
    val nodes = e.select(col("a").as("n"))
      .union(e.select(col("b").as("n"))).distinct().localCheckpoint(true)
    val pairs = nodes.select(col("n").as("pa"))
      .crossJoin(nodes.select(col("n").as("pb")))
    var sim = pairs.select(col("pa"), col("pb"),
      when(col("pa") === col("pb"), lit(1000000L)).otherwise(lit(0L)).as("s"))
    (1 to SimRounds).foreach { _ =>
      val prev = sim.select(col("pa").as("i"), col("pb").as("j"), col("s").as("ps"))
      val cont = e.select(col("b").as("ca"), col("a").as("i"))
        .crossJoin(e.select(col("b").as("cb"), col("a").as("j")))
        .join(prev, Seq("i", "j"))
        .groupBy(col("ca"), col("cb")).agg(sum(col("ps")).as("sum_s"))
      sim = pairs
        .join(cont, col("pa") === col("ca") && col("pb") === col("cb"), "left")
        .join(deg.select(col("n").as("pa"), col("ind").as("ia")), Seq("pa"), "left")
        .join(deg.select(col("n").as("pb"), col("ind").as("ib")), Seq("pb"), "left")
        .select(col("pa"), col("pb"),
          when(col("pa") === col("pb"), lit(1000000L))
            .otherwise(coalesce(
              Relational.intdiv(lit(4L) * col("sum_s"),
                lit(5L) * col("ia") * col("ib")), lit(0L))).as("s"))
        .localCheckpoint(true)
    }
    sim.select(col("pa").as("a"), col("pb").as("b"), col("s").as("s_micro"),
        (col("s").cast("double") / lit(1000000.0)).as("simrank"))
      .orderBy(col("a"), col("b"))
  }

  val graphSimrankSql: String = {
    val base =
      """ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |nx AS (SELECT event_type AS a, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts_ms, event_id) AS b FROM ev),
        |e AS (SELECT DISTINCT a, b FROM nx WHERE b IS NOT NULL AND a <> b),
        |deg AS (SELECT b AS n, CAST(COUNT(*) AS BIGINT) AS ind FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT n FROM
        |  (SELECT a AS n FROM e UNION ALL SELECT b FROM e)),
        |pairs AS (SELECT x.n AS pa, y.n AS pb FROM nodes x CROSS JOIN nodes y),
        |s0 AS (SELECT pa, pb, CAST(CASE WHEN pa = pb THEN 1000000 ELSE 0
        |    END AS BIGINT) AS s FROM pairs)""".stripMargin
    val rounds = (1 to SimRounds).map { i =>
      s"""s$i AS (SELECT p.pa, p.pb,
         |    CAST(CASE WHEN p.pa = p.pb THEN 1000000
         |      ELSE COALESCE((4 * c.sum_s) // (5 * da.ind * db.ind), 0)
         |      END AS BIGINT) AS s
         |  FROM pairs p
         |  LEFT JOIN (SELECT ea.b AS ca, eb.b AS cb,
         |      CAST(SUM(v.s) AS BIGINT) AS sum_s
         |    FROM e ea CROSS JOIN e eb
         |    JOIN s${i - 1} v ON v.pa = ea.a AND v.pb = eb.a
         |    GROUP BY 1, 2) c ON c.ca = p.pa AND c.cb = p.pb
         |  LEFT JOIN deg da ON da.n = p.pa
         |  LEFT JOIN deg db ON db.n = p.pb)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
       |$rounds
       |SELECT pa AS a, pb AS b, s AS s_micro,
       |  CAST(s AS DOUBLE) / 1000000.0e0 AS simrank
       |FROM s$SimRounds ORDER BY a, b""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_eccentricity" -> (graphEccentricity _),
    "graph_walks" -> (graphWalks _),
    "graph_simrank" -> (graphSimrank _))

  val oracles: Map[String, String] = Map(
    "graph_eccentricity" -> graphEccentricitySql,
    "graph_walks" -> graphWalksSql,
    "graph_simrank" -> graphSimrankSql)
}
