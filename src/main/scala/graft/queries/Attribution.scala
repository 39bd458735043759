package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Removal-effect Markov attribution (Anderl et al. 2016) — the
  * data-driven sibling of the heuristic `attribution_position`
  * (TimeSeriesQueries.scala): build the first-order Markov chain of
  * user journeys (START → channel… → CONV | NULL, truncated at the
  * first purchase), estimate each journey's conversion probability,
  * then score every channel by how much total conversion probability
  * disappears when that channel is knocked out (its state's value
  * clamped to zero — paths through it fail).
  *
  * Determinism (the pagerank discipline): probabilities live in
  * SCALED INTEGER micro-units; each of the [[MkRounds]] value-
  * iteration rounds is one integer Σ cnt·v followed by ONE exact
  * floor division by the state's out-degree, replayed in the oracle
  * as unrolled CTEs. The final removal effect is an integer
  * micro-share; only the two reporting columns divide to double.
  *
  * Truncation: v_K(START) counts conversion mass reachable within K
  * transitions — certified as implemented (the oracle replays the
  * same K); rounds beyond the longest journey are exact fixpoints.
  *
  * Scale: journey edges are ONE keyed window pass over events + a
  * hash aggregation down to the (channel+2)² transition table; the
  * iteration then runs on (channels+1) × states rows — alphabet-
  * bounded, corpus-independent. The tiny edge table is checkpoint-
  * barriered so the K-round loop never re-runs the corpus window.
  */
object Attribution {

  private val MkRounds = 8
  private val Scale = 1000000L

  /** Transition counts: src, dst, cnt, outc (out-degree total). */
  private def journeyEdges(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    // r12: the per-user limits are WINDOW aggregates over the same
    // user_id partitioning as rn — the old groupBy + join-back re-read
    // the whole windowed stream a second time (profiled: two full
    // exchanges of the event stream per execution). All three windows
    // share one exchange + sort; values are identical integer logic.
    val wu = Window.partitionBy(col("user_id"))
    val rn = ev.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("fprn",
        min(when(col("event_type") === "purchase", col("rn"))).over(wu))
      .withColumn("n", max(col("rn")).over(wu))
      .withColumn("L",
        when(col("fprn").isNotNull, col("fprn") - 1).otherwise(col("n")))
      .withColumn("term",
        when(col("fprn").isNotNull, lit("CONV")).otherwise(lit("NULL")))
    val kept = rn.filter(col("rn") <= col("L"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    val mid = kept
      .withColumn("dst", coalesce(lead(col("event_type"), 1).over(w2), col("term")))
      .select(col("event_type").as("src"), col("dst"))
    val starts = kept.filter(col("rn") === 1L)
      .select(lit("START").as("src"), col("event_type").as("dst"))
    val zero = rn.filter(col("rn") === 1L && col("L") === 0L)
      .select(lit("START").as("src"), col("term").as("dst"))
    val edges = mid.unionAll(starts).unionAll(zero)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
    val outs = edges.groupBy(col("src")).agg(sum(col("cnt")).as("outc"))
    edges.join(outs, "src").localCheckpoint(true)
  }

  /** channel, p_base, p_removed, re_micro (integer removal effect in
    * micro-units of p_base), attribution (share of total effect).
    */
  def markov(s: SparkSession, dir: String): DataFrame = {
    val ed = journeyEdges(s, dir)
    // r12: variants and ve are consumed by EVERY one of the unrolled MM
    // rounds (ve in each round's join, absorb — derived from variants —
    // in each round's unionAll). Left as plans they re-ran the distinct
    // and the crossJoin per round (profiled ~2 extra jobs/round).
    // Both are alphabet-bounded ((channels+1) and edges×(channels+1)
    // rows), so one eager single-partition checkpoint each is the
    // natural shape at any corpus size (the coalesce(1) rationale
    // below).
    val variants = ed.select(col("src")).filter(col("src") =!= "START").distinct()
      .select(col("src").as("removed"))
      .unionAll(s.range(1).select(lit("none").as("removed")))
      .coalesce(1).localCheckpoint(true)
    val ve = ed.crossJoin(broadcast(variants)).coalesce(1).localCheckpoint(true)
    val states = ed.select(col("src").as("state")).distinct()
      .unionAll(s.range(1).select(lit("CONV").as("state")))
      .unionAll(s.range(1).select(lit("NULL").as("state")))
    val absorb = variants
      .select(col("removed"), lit("CONV").as("state"), lit(Scale).as("v"))
      .unionAll(variants
        .select(col("removed"), lit("NULL").as("state"), lit(0L).as("v")))
    var v = variants.crossJoin(states)
      .select(col("removed"), col("state"),
        when(col("state") === "CONV", lit(Scale)).otherwise(lit(0L)).as("v"))
    // ckptReset per round (the graph_mst recipe): without the barrier
    // the 8 unrolled rounds compound into a 130-shuffle static plan
    // whose optimization alone dominates wall time; with it every
    // round's plan is flat (one join + one agg over the checkpointed
    // previous round) and the per-round frame is alphabet-bounded
    // ((channels+1) × states rows), so the eager materialization is
    // cheap. Round N−1's blocks are freed once round N lands.
    // coalesce(1) before each checkpoint, and broadcast() the small
    // sides below: the checkpoint wrapper's LogicalRDD carries DEFAULT
    // size stats, so without the hints Catalyst planned the tail's
    // crossJoins as 32×32-partition CartesianProducts over ≤99-row
    // frames — measured 6–7 s of pure empty-task scheduling at sf0.1
    // (the rounds themselves are ~0.3 s each). The frame is
    // (channels+1) × states rows — alphabet-bounded — so one
    // partition is its natural shape at ANY corpus size.
    var prevCkpt: DataFrame = null
    (1 to MkRounds).foreach { _ =>
      val p = broadcast(v.select(col("removed").as("rem_p"),
        col("state").as("st_p"), col("v").as("pv")))
      v = graft.Caches.checkpointReset(
        ve.join(p, col("removed") === col("rem_p") && col("dst") === col("st_p"))
          .groupBy(col("removed"), col("src"))
          .agg(sum(col("cnt") * col("pv")).as("scv"), max(col("outc")).as("o"))
          .select(col("removed"), col("src").as("state"),
            when(col("src") === col("removed"), lit(0L))
              .otherwise(Relational.intdiv(col("scv"), col("o"))).as("v"))
          .unionAll(absorb)
          .coalesce(1))
      if (prevCkpt != null) graft.Caches.free(prevCkpt)
      prevCkpt = v
    }
    val pb = v.filter(col("removed") === "none" && col("state") === "START")
      .select(col("v").as("pbase"))
    val pr = v.filter(col("removed") =!= "none" && col("state") === "START")
      .select(col("removed").as("channel"), col("v").as("prem"))
    val re = pr.crossJoin(broadcast(pb)).withColumn("re_micro",
      when(col("pbase") > 0,
        Relational.intdiv((col("pbase") - col("prem")) * lit(Scale), col("pbase")))
        .otherwise(lit(0L)))
    val tot = re.agg(sum(col("re_micro")).as("t"))
    // Materialize the ≤channels-row result, then free the terminal
    // round's checkpoint and the edge-table checkpoint (r9 ADVICE: a
    // long-lived session running many queries back-to-back would
    // otherwise accrete these blocks until Caches.sweep). The
    // result's own single tiny block remains the sweep's job — any
    // checkpoint-backed return value has exactly one such residue.
    val result = graft.Caches.checkpointReset(
      re.crossJoin(broadcast(tot)).select(col("channel"),
          (col("pbase").cast("double") / lit(1000000.0)).as("p_base"),
          (col("prem").cast("double") / lit(1000000.0)).as("p_removed"),
          col("re_micro"),
          when(col("t") > 0, col("re_micro").cast("double") / col("t").cast("double"))
            .otherwise(lit(0.0)).as("attribution"))
        .orderBy(col("channel"))
        .coalesce(1))
    graft.Caches.free(prevCkpt)
    graft.Caches.free(ed)
    graft.Caches.free(variants)
    graft.Caches.free(ve)
    result
  }

  val markovSql: String = {
    val rounds = (1 to MkRounds).map { i =>
      s"""v$i AS (SELECT e.removed, e.src AS state,
         |    CAST(CASE WHEN e.src = e.removed THEN 0
         |      ELSE CAST(SUM(e.cnt * p.v) AS BIGINT) // MAX(e.outc) END AS BIGINT) AS v
         |  FROM ve e JOIN v${i - 1} p ON p.removed = e.removed AND p.state = e.dst
         |  GROUP BY e.removed, e.src
         |  UNION ALL SELECT removed, 'CONV', CAST(1000000 AS BIGINT) FROM var
         |  UNION ALL SELECT removed, 'NULL', CAST(0 AS BIGINT) FROM var)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
       |  FROM events),
       |rn AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
       |    ORDER BY ts_ms, event_id) AS BIGINT) AS rn FROM ev),
       |lim AS (SELECT user_id,
       |    CASE WHEN fprn IS NOT NULL THEN fprn - 1 ELSE n END AS L,
       |    CASE WHEN fprn IS NOT NULL THEN 'CONV' ELSE 'NULL' END AS term
       |  FROM (SELECT user_id,
       |      MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS fprn,
       |      MAX(rn) AS n FROM rn GROUP BY 1)),
       |kept AS (SELECT r.user_id, r.rn, r.event_type, l.term
       |  FROM rn r JOIN lim l USING (user_id) WHERE r.rn <= l.L),
       |mid AS (SELECT event_type AS src, COALESCE(LEAD(event_type) OVER (
       |    PARTITION BY user_id ORDER BY rn), term) AS dst FROM kept),
       |st0 AS (SELECT 'START' AS src, event_type AS dst FROM kept WHERE rn = 1),
       |z AS (SELECT 'START' AS src, term AS dst FROM lim WHERE L = 0),
       |edges AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT * FROM mid UNION ALL SELECT * FROM st0
       |    UNION ALL SELECT * FROM z) GROUP BY 1, 2),
       |outs AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS outc FROM edges GROUP BY 1),
       |var AS (SELECT DISTINCT src AS removed FROM edges WHERE src <> 'START'
       |  UNION ALL SELECT 'none'),
       |ve AS MATERIALIZED (SELECT v.removed, e.src, e.dst, e.cnt, o.outc
       |  FROM edges e JOIN outs o USING (src) CROSS JOIN var v),
       |states AS (SELECT DISTINCT src AS state FROM edges
       |  UNION ALL SELECT 'CONV' UNION ALL SELECT 'NULL'),
       |v0 AS (SELECT v.removed, s.state,
       |    CAST(CASE WHEN s.state = 'CONV' THEN 1000000 ELSE 0 END AS BIGINT) AS v
       |  FROM states s CROSS JOIN var v),
       |$rounds,
       |pb AS (SELECT v AS pbase FROM v$MkRounds
       |  WHERE removed = 'none' AND state = 'START'),
       |pr AS (SELECT removed AS channel, v AS prem FROM v$MkRounds
       |  WHERE removed <> 'none' AND state = 'START'),
       |re AS (SELECT channel, pbase, prem,
       |    CASE WHEN pbase > 0 THEN ((pbase - prem) * 1000000) // pbase
       |      ELSE 0 END AS re_micro
       |  FROM pr CROSS JOIN pb),
       |tot AS (SELECT CAST(SUM(re_micro) AS BIGINT) AS t FROM re)
       |SELECT channel, CAST(pbase AS DOUBLE) / 1000000.0e0 AS p_base,
       |  CAST(prem AS DOUBLE) / 1000000.0e0 AS p_removed,
       |  CAST(re_micro AS BIGINT) AS re_micro,
       |  CASE WHEN t > 0 THEN CAST(re_micro AS DOUBLE) / CAST(t AS DOUBLE)
       |    ELSE 0.0e0 END AS attribution
       |FROM re CROSS JOIN tot ORDER BY channel""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attribution_markov" -> (markov _))

  val oracles: Map[String, String] = Map(
    "attribution_markov" -> markovSql)
}
