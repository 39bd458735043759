package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale evidence: bucketing as the zero-exchange co-location
  * strategy for the repeated big-big joins a 100 TB deployment runs
  * daily (orders ⋈ lineitem). Writing both sides bucketed+sorted by
  * the join key lets SortMergeJoin consume the buckets directly —
  * the physical plan carries NO shuffle exchange on either side,
  * which at cluster scale removes the dominant network cost of every
  * subsequent join on that key. The same declaration is what a
  * production graft deployment would emit from its table-layout DDL.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ lineitem plans with zero shuffle exchanges") {
    // static warehouse conf can't change at runtime; explicit external
    // table paths under a temp dir give the same isolation
    val wh = Files.createTempDirectory("graft-bucket-wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    // MERGE hint: at sf0.001 the planner would broadcast these tiny
    // tables; the production-scale strategy under test is bucketed SMJ
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must be exchange-free: bucket-aligned SMJ; the
    // only allowed exchange is the final tiny groupBy on orderstatus
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!joinPart.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    // and it still computes the right thing
    val viaBuckets = joined.collect().map(r =>
      (r.getString(0), r.getLong(1))).toMap
    val direct = graft.Tables(spark, dir, "orders")
      .join(graft.Tables(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaBuckets == direct)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
