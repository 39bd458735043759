package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[LinkOps]] certified against independent plain-Scala references:
  * Fellegi–Sunter likelihood-ratio scores, the integer-exact truncated
  * Katz recursion, and the resource-allocation index.
  */
class LinkOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("er_fellegi_sunter equals the plain-Scala likelihood-ratio score") {
    val got = LinkOps.erFellegiSunter(spark, dir).collect()
    assert(got.nonEmpty)
    val cs = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue(), r.getString(3)))
    val byId = cs.map(c => c._1 -> c).toMap
    val n = cs.length.toDouble
    def uOf[K](vals: Seq[K]): Double = {
      val fs = vals.groupBy(identity).values.map(_.size.toLong)
      fs.map(f => (f * (f - 1)).toDouble).sum / (n * (n - 1.0))
    }
    val uNat = uOf(cs.map(_._3).toSeq)
    val uSeg = uOf(cs.map(_._4).toSeq)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    got.foreach { r =>
      val a = byId(r.getLong(0)); val b = byId(r.getLong(1))
      val gName = if (lev(a._2, b._2) <= 2) 1 else 0
      val gNat = if (a._3 == b._3) 1 else 0
      val gSeg = if (a._4 == b._4) 1 else 0
      assert(r.getInt(2) == gName && r.getInt(3) == gNat && r.getInt(4) == gSeg,
        s"gamma for pair ${(r.getLong(0), r.getLong(1))}")
      val score =
        (if (gName == 1) 0.95 / 0.001 else (1.0 - 0.95) / (1.0 - 0.001)) *
          (if (gNat == 1) 0.9 / uNat else (1.0 - 0.9) / (1.0 - uNat)) *
          (if (gSeg == 1) 0.9 / uSeg else (1.0 - 0.9) / (1.0 - uSeg))
      assert(math.abs(r.getAs[Double]("score") - score) < 1e-9 * score,
        s"score for pair ${(r.getLong(0), r.getLong(1))}")
    }
  }

  test("graph_katz equals the plain-Scala integer recursion") {
    val edges = Relational.graphBuild(spark, dir)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = edges ++ edges.map { case (u, v) => (v, u) }
    val inNbrs = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = sym.map(_._1).distinct
    var x = nodes.map(_ -> 1000000L).toMap
    (1 to 4).foreach { _ =>
      x = nodes.map { v =>
        v -> (1000000L + inNbrs.getOrElse(v, Array.empty[Long])
          .map(u => (5L * x(u)) / 100L).sum)
      }.toMap
    }
    val got = LinkOps.graphKatz(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == x.keySet)
    x.foreach { case (v, k) => assert(got(v) == k, s"node $v") }
  }

  test("graph_resource_alloc equals the plain-Scala RA index") {
    // sf0.001's co-supply graph has no non-adjacent wedge pair; use sf0.01
    val dir = "/root/testdata/sf0.01"
    val edges = Relational.graphBuild(spark, dir)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = edges.toSet
    val sym = edges ++ edges.map { case (u, v) => (v, u) }
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = sym.groupBy(_._1).view.mapValues(_.length).toMap
    val ra = (for {
      u <- nbrs.keys; v <- nbrs.keys
      if u < v && !edgeSet((u, v))
      common = nbrs(u) intersect nbrs(v)
      if common.nonEmpty
    } yield (u, v) -> common.toSeq.sorted.map(z => 1.0 / deg(z)).sum).toMap
    val got = LinkOps.graphResourceAlloc(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(ra.contains(key), s"pair $key not a valid candidate")
      assert(math.abs(r.getAs[Double]("ra") - ra(key)) < 1e-12, s"ra $key")
    }
    // the top-30 really is the top of the full candidate set
    val worstEmitted = got.map(_.getAs[Double]("ra")).min
    val notEmitted = ra.filterNot { case (k, _) =>
      got.exists(r => (r.getLong(0), r.getLong(1)) == k) }
    notEmitted.values.foreach(v => assert(v <= worstEmitted + 1e-12))
  }
}
