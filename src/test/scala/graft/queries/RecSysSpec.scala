package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** rec_als certified against an independent plain-Scala ALS replay
  * (the DuckDB oracle runs in the driver gate), plus the ALS descent
  * property: the re-solved user factors cannot increase any user's
  * regularized objective.
  */
class RecSysSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Lam = 0.1

  private def h8(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }
  private def seed(k: Long, c: Int): Double =
    0.5 + (h8(s"$k:$c") % 1000).toDouble / 2000.0

  test("rec_als equals a plain-Scala ALS replay and each user solve descends") {
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ords = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rat = li.groupBy(e => (ords(e._1), e._2)).map { case ((u, i), g) =>
      (u, i, g.map(_._3).sum.toDouble)
    }.toSeq

    def solve(entries: Seq[(Long, Double, Double, Double)]): (Double, Double) = {
      // entries: (otherKey, f1, f2, r) — fold in otherKey order
      var (a11, a12, a22, b1, b2) = (Lam, 0.0, Lam, 0.0, 0.0)
      entries.sortBy(_._1).foreach { case (_, q1, q2, r) =>
        a11 += q1 * q1; a12 += q1 * q2; a22 += q2 * q2
        b1 += r * q1; b2 += r * q2
      }
      val det = a11 * a22 - a12 * a12
      ((a22 * b1 - a12 * b2) / det, (a11 * b2 - a12 * b1) / det)
    }
    val q0 = rat.map(_._2).distinct.map(i => i -> (seed(i, 1), seed(i, 2))).toMap
    def userSolve(q: Map[Long, (Double, Double)]) =
      rat.groupBy(_._1).map { case (u, g) =>
        u -> solve(g.map(e => (e._2, q(e._2)._1, q(e._2)._2, e._3)))
      }
    def itemSolve(p: Map[Long, (Double, Double)]) =
      rat.groupBy(_._2).map { case (i, g) =>
        i -> solve(g.map(e => (e._1, p(e._1)._1, p(e._1)._2, e._3)))
      }
    val p1 = userSolve(q0)
    val q1 = itemSolve(p1)
    val p2 = userSolve(q1)
    def sse(u: Long, p: (Double, Double)): Double =
      rat.filter(_._1 == u).sortBy(_._2).foldLeft(0.0) { case (a, (_, i, r)) =>
        val e = r - (p._1 * q1(i)._1 + p._2 * q1(i)._2); a + e * e
      }

    val got = RecSys.recAls(spark, dir).collect()
    assert(got.length == p2.size && got.nonEmpty)
    def close(a: Double, b: Double) =
      math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b))
    got.foreach { r =>
      val u = r.getLong(0)
      assert(r.getLong(1) == rat.count(_._1 == u))
      assert(close(r.getDouble(2), p2(u)._1), s"u=$u p1")
      assert(close(r.getDouble(3), p2(u)._2), s"u=$u p2")
      assert(close(r.getDouble(4), sse(u, p2(u))), s"u=$u sse")
      // descent: the re-solved p2 minimizes the ridge objective given q1
      val obj2 = sse(u, p2(u)) + Lam * (p2(u)._1 * p2(u)._1 + p2(u)._2 * p2(u)._2)
      val obj1 = sse(u, p1(u)) + Lam * (p1(u)._1 * p1(u)._1 + p1(u)._2 * p1(u)._2)
      assert(obj2 <= obj1 + 1e-9, s"u=$u ALS step increased the objective")
    }
  }

  test("rec_slopeone equals a plain-Scala weighted Slope One replay") {
    val rat = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(e => (e._1, e._2)).map { case ((ok, i), g) => (ok, i, g.map(_._3).sum) }
      .toSeq
    val byOrder = rat.groupBy(_._1)
    val pairs = byOrder.values.flatMap { items =>
      for (a <- items; b <- items if a._2 != b._2)
        yield (a._2, b._2, a._3, b._3) // (j, i, rj, ri)
    }.toSeq
    val dev = pairs.groupBy(p => (p._1, p._2)).map { case ((j, i), g) =>
      (j, i) -> (g.size.toLong, g.map(p => p._3 - p._4).sum.toDouble / g.size.toDouble)
    }
    val errByTarget = byOrder.toSeq.flatMap { case (ok, items) =>
      items.flatMap { case (_, j, rj) =>
        val ns = items.filter(_._2 != j).sortBy(_._2)
        if (ns.isEmpty) None else {
          var num = 0.0; var den = 0L
          ns.foreach { case (_, i, ri) =>
            val (c, d) = dev((j, i)); num += c.toDouble * (ri.toDouble + d); den += c
          }
          Some((j, ok, num / den.toDouble - rj.toDouble))
        }
      }
    }
    val want = errByTarget.groupBy(_._1).map { case (j, g) =>
      j -> (g.size.toLong, g.sortBy(_._2).foldLeft(0.0)((a, e) => a + e._3 * e._3))
    }
    val got = RecSys.recSlopeOne(spark, dir).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, sse) = want(r.getLong(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - sse) <= 1e-9 * math.max(1.0, sse),
        s"part=${r.getLong(0)}")
    }
  }
}
