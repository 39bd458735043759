package graft

import org.scalatest.funsuite.AnyFunSuite

/** The partition-count-invariance gate (round 10): every registered
  * query must produce BIT-IDENTICAL results when the session's
  * shuffle-partition count changes (4 → 7). A double summed across
  * rows folds in partition order, so an order-dependent aggregation
  * that happens to hash-match the DuckDB oracle at one partitioning
  * is a latent red row waiting for a cluster with a different
  * parallelism — this spec surfaces it as a loud diff instead.
  * Rows are compared as a sorted multiset of canonical renderings
  * (the driver's compare also sorts rows), with byte arrays hexed
  * and nested arrays/structs rendered recursively, so the check is
  * exact on every cell including doubles (rendered via
  * Double.toString — shortest-repr, injective on distinct doubles).
  */
class DeterminismSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSpec.session

  private def render(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => "0x" + b.map(x => f"$x%02x").mkString
    case a: scala.collection.Seq[_] => a.map(render).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(render).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => render(k) + "->" + render(x) }
        .sorted.mkString("{", ",", "}")
    case d: java.lang.Double => java.lang.Double.toString(d)
    case f: java.lang.Float => java.lang.Float.toString(f)
    case other => other.toString
  }

  private def runAll(parts: String): Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    // session indexes first (the Verify recipe) so the sweep keeps them
    graft.queries.KgPipeline.kg(spark, dir)
    graft.queries.Relational.graphBuild(spark, dir).count()
    val keep = Caches.persistentIds(spark)
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val rows = fn(spark, dir).collect().toSeq
        .map(r => render(r)).sorted
      Caches.sweep(spark, keep)
      name -> rows
    }.toMap
  }

  test("every registered query is invariant to the shuffle partition count") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val a = runAll("4")
      val b = runAll("7")
      val diffs = a.keys.toSeq.sorted.flatMap { k =>
        if (a(k) == b(k)) None
        else {
          val firstDiff = a(k).zipAll(b(k), "<missing>", "<missing>")
            .find { case (x, y) => x != y }
          Some(s"$k: ${a(k).size} vs ${b(k).size} rows; first diff: " +
            firstDiff.map { case (x, y) => s"$x ≠ $y" }.getOrElse("?"))
        }
      }
      assert(diffs.isEmpty,
        s"${diffs.size} queries changed results when shuffle partitions " +
          s"changed 4 → 7 (order-dependent aggregation?):\n" +
          diffs.mkString("\n"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
