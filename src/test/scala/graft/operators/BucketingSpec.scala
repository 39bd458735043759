package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located join via bucketing (builder brief: "bucketing for
  * co-located joins"): both sides bucketed on the join key join with
  * ZERO exchanges — the 100 TB pattern for repeated big-big joins.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle on either side") {
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val customer = graft.Tables(spark, "/root/testdata/sf0.001", "customer")
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val (tOrders, tCustomer) = (s"b_orders_$tag", s"b_customer_$tag")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable(tOrders)
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable(tCustomer)
    val joined = spark.table(tOrders)
      .join(spark.table(tCustomer),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last // below the agg
    assert(!joinSection.contains("Exchange hashpartitioning(o_custkey") &&
      !joinSection.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.collect().map(_.getLong(1)).sum == orders.count())
    spark.sql(s"DROP TABLE IF EXISTS $tOrders")
    spark.sql(s"DROP TABLE IF EXISTS $tCustomer")
  }

  test("ST7 extension: watermarked tumbling-window counts (batch parity)") {
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val counts = graft.streaming.StreamPipeline.windowedCounts(
      events, "ts", "event_type", "1 day", "1 hour")
    val total = counts.agg(sum("cnt")).collect().head.getLong(0)
    assert(total == events.count()) // every event lands in exactly one window
    assert(counts.select(countDistinct("win_start")).collect().head.getLong(0) >= 28)
  }
}
