package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    // 90% of the big side shares one hot key
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k950", "A"), ("k999", "B")).toDF("k", "tag")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8, bigIdCols = Seq($"k", $"v"))
    assert(salted.count() == plain.count())
    assert(salted.select("k", "v", "tag").except(plain.select("k", "v", "tag")).count() == 0)
    assert(plain.select("k", "v", "tag").except(salted.select("k", "v", "tag")).count() == 0)
  }

  test("hotKeys flags the power-law key only") {
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i)).toDF("k", "v")
    val hot = Skew.hotKeys(big, "k", threshold = 0.05)
    assert(hot.select("k").as[String].collect().toSeq == Seq("hot"))
  }

  test("partition pruning: dataset-partitioned table scans only the queried partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Seq(("a", "p1", 1), ("b", "p1", 2), ("c", "p2", 3))
      .toDF("id", "dataset", "v")
      .write.partitionBy("dataset").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter($"dataset" === "p1")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dataset"))
    assert(df.count() == 2)
    // the Q8 index-routing analogue: per-project partition == per-project index
  }
}
