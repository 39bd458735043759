package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The co-located-join layout proven on real tables: orders ⨝ lineitem
  * bucketed on the order key must plan with ZERO Exchange (the write
  * pre-paid the shuffle), and the join result must equal the plain
  * shuffled join.
  */
class LayoutSpec extends SparkSpec {

  test("co-bucketed orders and lineitem join with zero Exchange, results equal the shuffled join") {
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("bucketed").toString
    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"), col("l_quantity"))
    Layout.writeBucketed(orders, "orders_b", s"$base/orders", Seq("o_orderkey"), 8)
    Layout.writeBucketed(lineitem, "lineitem_b", s"$base/lineitem", Seq("o_orderkey"), 8)
    try {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      // disable broadcast so the assertion exercises the co-located
      // SortMergeJoin path a 100 TB fact-fact join would take
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Layout.colocatedJoin(spark, "orders_b", "lineitem_b", Seq("o_orderkey"))
        val p = joined.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"),
          s"co-bucketed join must not shuffle either side:\n$p")
        assert(p.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$p")
        assert(p.contains("Bucketed: true"),
          s"scans must read the bucket layout:\n$p")
        // NOTE the plan keeps per-partition Sort nodes: Spark ≥3.0 only
        // propagates bucket-sort ordering behind
        // spark.sql.legacy.bucketedTableScan.outputOrdering. The Sort is
        // in-partition (no shuffle) — the Exchange elimination above is
        // the cost that matters at scale.
        val viaBuckets = joined.count()
        val shuffled = orders.join(lineitem, "o_orderkey").count()
        assert(viaBuckets == shuffled && viaBuckets > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
