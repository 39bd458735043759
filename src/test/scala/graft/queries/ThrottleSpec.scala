package graft.queries

import graft.SparkSpec

/** Burst throttle: the one-pass gaps-and-islands formulation equals
  * the sequential greedy reference on random event streams.
  */
class ThrottleSpec extends SparkSpec {
  import spark.implicits._

  test("property: window formulation equals the sequential greedy chain") {
    val rnd = new scala.util.Random(47)
    (0 until 10).foreach { trial =>
      val n = 5 + rnd.nextInt(80)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(3).toLong, Seq("a", "b")(rnd.nextInt(2)),
          i.toLong, rnd.nextInt(40).toLong)
      }
      // sequential greedy per (user, type): keep iff gap from the
      // PREVIOUS event (kept or not) exceeds the threshold — chain
      // semantics, matching the operator's lag-based burst opening
      val expected = rows.groupBy(r => (r._1, r._2)).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (r._4, r._3))
        sorted.zip(None +: sorted.map(Some(_))).collect {
          case (cur, prev) if prev.forall(p => cur._4 - p._4 > 5) => cur._3
        }
      }.toSet
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"u", $"t").orderBy($"ts", $"id")
      val got = rows.toDF("u", "t", "id", "ts")
        .withColumn("open", when($"ts" - lag($"ts", 1).over(w) > 5 ||
          lag($"ts", 1).over(w).isNull, 1L).otherwise(0L))
        .filter($"open" === 1L)
        .select($"id").collect().map(_.getLong(0)).toSet
      assert(got == expected, s"trial=$trial")
    }
  }
}
