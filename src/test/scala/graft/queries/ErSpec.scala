package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Entity-resolution two-pass design: tight blocking loses exactly the
  * cross-block boundary pairs, the sorted-neighborhood pass recovers
  * them, and their union equals the brute-force reference on a corpus
  * where both effects occur.
  */
class ErSpec extends SparkSpec {
  import spark.implicits._

  test("blocked + sorted-neighborhood union equals brute force; blocking alone does not") {
    // names crafted so near-dups (lev<=1) straddle the 3-char block
    // boundary: abc1/abc2 share a block; abc9/abd9 do NOT, and abd8
    // sits between them in sort order (so w=1 would still miss it —
    // the spec uses the query's w=2)
    val names = Seq(
      (1L, "abc1"), (2L, "abc2"), (3L, "abc9"),
      (4L, "abd9"), (5L, "abd8"),
      (6L, "zzz5"), (7L, "zzz6"))
    val df = names.toDF("id", "name")
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names if ia < ib
      if levDist(na, nb) <= 1
    } yield (ia, ib)).toSet

    val blocked = df.as("a").join(df.as("b"),
        substring(col("a.name"), 1, 3) === substring(col("b.name"), 1, 3) &&
          col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.name"), col("b.name"), 1) =!= -1)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(brute))
    assert(blocked != brute, "fixture must exercise the boundary-pair loss")
    assert(!blocked.contains((3L, 4L)), "abc9/abd9 straddle blocks")

    // sorted neighborhood w=2 over name order (the query's window)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("name"), col("id"))
    val sn = Seq(1, 2).map { k =>
      df.withColumn("nk", lead(col("id"), k).over(w))
        .withColumn("nn", lead(col("name"), k).over(w))
        .filter(col("nk").isNotNull &&
          levenshtein(col("name"), col("nn"), 1) =!= -1)
        .select(least(col("id"), col("nk")).as("a"),
          greatest(col("id"), col("nk")).as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }.reduce(_ ++ _)
    assert((blocked ++ sn) == brute,
      s"union must equal brute force: got ${blocked ++ sn}, want $brute")
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
