package graft

import graft.queries.{KgPipeline, Relational}

/** Physical-plan assertions (builder brief: "explain the plan and
  * iterate until it's the plan you'd want"). Checks that the properties
  * the 100 TB design relies on actually reach the executed plan:
  * filter pushdown to the parquet scan, column pruning, broadcast of
  * small dimensions, map-side partial aggregation, whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("broadcast_dim: dimension filter pushed to scan, fact side broadcast-joined") {
    val p = plan(Relational.broadcastDim(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "small dim must broadcast, not shuffle")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(p_size,25)"),
      "p_size > 25 must reach the parquet scan")
  }

  test("join_denorm: nation broadcast; no cartesian anywhere") {
    val p = plan(Relational.joinDenorm(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("agg_pricing: partial (map-side) aggregation before the shuffle") {
    val p = plan(Relational.aggPricing(spark, dir))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expect partial + final hash aggregate")
    assert(p.contains("partial_sum"), "map-side combine must run before the shuffle")
    // note: WholeStageCodegen markers only appear once AQE finalizes the
    // plan; partial_sum + paired HashAggregates are the stable signal.
  }

  test("column pruning: pricing scan reads only the needed lineitem columns") {
    val p = plan(Relational.aggPricing(spark, dir))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_orderkey"),
      s"unused columns must be pruned from the scan: $readSchema")
  }

  test("semi_join: planned as a real semi join (no row duplication)") {
    val p = plan(Relational.semiJoin(spark, dir))
    assert(p.contains("LeftSemi"), s"expected LeftSemi in:\n$p")
  }

  test("kg_search: glossary extraction plane is shuffle-free up to scoring") {
    val df = KgPipeline.kgSearch(spark, dir)
    val exchanges = "Exchange".r.findAllIn(plan(df)).length
    // one shuffle for the score groupBy, one for the freetext join side,
    // one for the final orderBy — the extraction map itself adds none
    assert(exchanges <= 6, s"extraction plane leaking shuffles: $exchanges exchanges")
  }

  test("facet_topk: limit applied after partial aggregation, no global sort of input") {
    val p = plan(Relational.facetTopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrderedAndProject, not Sort+Limit of the full data")
  }
}
