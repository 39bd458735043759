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

  test("zValue: hand-checked Morton interleave and quadrant locality") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // z(x,y) interleaves x into even bits, y into odd bits
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L), (65535L, 0L, 0x55555555L),
      (0L, 65535L, 0xAAAAAAAAL), (65535L, 65535L, 0xFFFFFFFFL))
    val got = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._3))
    // locality: a power-of-two-aligned quadrant is one contiguous z
    // range — the property parquet min/max pruning relies on
    val zs = (for { x <- 0L to 31L; y <- 0L to 31L } yield (x, y)).toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y", 16).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val quad = (for { x <- 16L to 31L; y <- 16L to 31L } yield zs((x, y))).sorted
    assert(quad.head == zs((16L, 16L)) && quad.last == zs((31L, 31L)) &&
      quad.last - quad.head == quad.size - 1,
      "upper-right quadrant must be one contiguous z range")
  }
}
