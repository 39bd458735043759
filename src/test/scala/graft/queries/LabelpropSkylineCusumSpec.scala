package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LabelpropSkylineCusumSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("labelprop communities are node labels and sizes reconcile") {
    val rows = Relational.graphLabelprop(spark, dir).collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_.getAs[Long]("node")).toSet
    // a community label is always some node's id (labels only ever
    // copy existing labels, which start as node ids)
    rows.foreach(r => assert(nodes.contains(r.getAs[Long]("community"))))
    val bySize = rows.groupBy(_.getAs[Long]("community"))
    rows.foreach(r => assert(r.getAs[Long]("community_size") ==
      bySize(r.getAs[Long]("community")).length))
  }

  test("skyline contains no dominated point and dominates every non-member") {
    val sky = Relational.skylineParts(spark, dir).collect()
      .map(r => (r.getAs[Double]("p_retailprice"), r.getAs[Int]("p_size")))
    assert(sky.nonEmpty)
    val all = graft.Tables(spark, dir, "part")
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    def dominates(a: (Double, Int), b: (Double, Int)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    // brute-force O(n^2) ground truth at sf0.001
    sky.foreach(p => assert(!all.exists(q => dominates(q, p)),
      s"skyline point $p is dominated"))
    all.filterNot(p => sky.exists(s => s._1 == p._1 && s._2 == p._2))
      .foreach(p => assert(sky.exists(s => dominates(s, p)),
        s"non-member $p not dominated by any skyline point"))
  }

  test("cusum matches a hand-computed fixture through the same fold") {
    // xs = [3, 1, 4, 0], mean = 2: S = [1, 0, 2, 0], max = 2
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 3.0), (1L, 2L, 1.0), (1L, 3L, 4.0), (1L, 4L, 0.0)
    ).toDF("user_id", "event_id", "value")
      .select(col("user_id"), col("event_id"), col("value"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
    df.createOrReplaceTempView("cusum_fixture")
    // drive the registered query's fold shape directly on the fixture
    val arr = df.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        unix_millis(col("ts")).as("ts_ms"), col("event_id"), col("value")))).as("a"))
      .select(col("user_id"), transform(col("a"), x => x.getField("value")).as("xs"))
      .withColumn("n", size(col("xs")))
      .withColumn("mean",
        aggregate(col("xs"), lit(0.0), (a, v) => a + v) / col("n").cast("double"))
      .select(col("user_id"),
        aggregate(col("xs"), struct(lit(0.0).as("m"), lit(0.0).as("s")),
          (acc, v) => struct(
            greatest(acc.getField("m"),
              greatest(acc.getField("s") + (v - col("mean")), lit(0.0))).as("m"),
            greatest(acc.getField("s") + (v - col("mean")), lit(0.0)).as("s")))
          .getField("m").as("cusum_max"))
      .collect()
    assert(arr.head.getAs[Double]("cusum_max") == 2.0)
  }
}
