package graft.queries

import org.apache.spark.sql.execution.LogicalRDD

/** r5 VERDICT #5: the memoized co-supply edge index must not accrete
  * without bound in a multi-directory session. Distinct dir keys are
  * simulated with symlinks to the same tiny corpus (testdata is
  * read-only; the key is the path STRING, so a symlink is a distinct
  * tenant as far as the cache is concerned).
  */
class EdgeCacheSpec extends graft.SparkSpec {

  private def rddIds(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd.id }

  test("edge index cache is LRU-bounded and frees evicted indexes") {
    val base = java.nio.file.Paths.get("/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("edgecache")
    val dirs = (1 to 6).map { i =>
      val link = tmp.resolve(s"tenant$i")
      java.nio.file.Files.createSymbolicLink(link, base)
      link.toString
    }
    val first = Relational.graphBuild(spark, dirs.head)
    val firstIds = rddIds(first)
    assert(firstIds.nonEmpty, "index should be checkpoint-backed")
    // same key -> same memoized instance, no rebuild
    assert(Relational.graphBuild(spark, dirs.head) eq first)
    dirs.tail.foreach(d => Relational.graphBuild(spark, d).count())
    assert(Relational.edgeCacheSize <= 4,
      s"cache grew to ${Relational.edgeCacheSize} entries")
    // the least-recently-used index (tenant1) was evicted AND its
    // storage blocks freed
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(firstIds.forall(id => !persisted.contains(id)),
      "evicted index still pins storage blocks")
    // an evicted key transparently rebuilds into a NEW instance
    val rebuilt = Relational.graphBuild(spark, dirs.head)
    assert(!(rebuilt eq first))
    assert(rebuilt.columns.toSeq == Seq("u", "v", "shared"))
  }

  test("a cache hit whose blocks were externally swept self-heals instead of serving a stale frame") {
    val dir = "/root/testdata/sf0.001"
    val before = Relational.graphBuild(spark, dir)
    before.count() // materialize
    // an external janitor frees EVERYTHING (the ScaleStress-spec
    // full-suite poisoning scenario)
    graft.Caches.sweep(spark, Set.empty)
    val after = Relational.graphBuild(spark, dir)
    assert(!(after eq before), "stale swept frame must not be served")
    assert(after.count() > 0) // and the rebuilt index actually computes
  }
}
