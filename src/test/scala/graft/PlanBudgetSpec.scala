package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The plan-budget drift gate (r5 VERDICT #7): every registered
  * query's static plan shape — shuffle / broadcast / sort / cartesian
  * node counts — must match the checked-in `PLAN_BUDGETS.md` row for
  * row. An edit that sneaks an extra Exchange into any query fails
  * here with the exact diff; an intentional plan change regenerates
  * the table (`sbt "runMain graft.PlanBudget /root/testdata/sf0.001"`)
  * so the diff lands in review, not in a 100 TB run.
  */
class PlanBudgetSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private val budgetFile = Paths.get("PLAN_BUDGETS.md")

  private lazy val pinned: Map[String, PlanBudget.Counts] =
    PlanBudget.parse(new String(Files.readAllBytes(budgetFile), "UTF-8")).toMap

  test("PLAN_BUDGETS.md covers exactly the current registry") {
    assume(Files.exists(budgetFile), "PLAN_BUDGETS.md not generated yet")
    val missing = SparkEntry.queries.keySet -- pinned.keySet
    val stale = pinned.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty && stale.isEmpty,
      s"budget table out of date — regenerate with PlanBudget. " +
        s"missing: ${missing.toSeq.sorted.mkString(",")} " +
        s"stale: ${stale.toSeq.sorted.mkString(",")}")
  }

  test("every query's static plan matches its pinned shuffle/broadcast/sort/cartesian/jobs budget") {
    assume(Files.exists(budgetFile) && Files.isDirectory(Paths.get(dir)))
    val spark = SparkSpec.session
    val drifted = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      pinned.get(name).flatMap { want =>
        // hermetic capture: same clearCache-before-capture discipline as
        // the generator (hermeticCounts clears the cache manager and
        // counts construction-time jobs), so the pin holds regardless
        // of suite order
        spark.catalog.clearCache()
        assert(spark.sharedState.cacheManager.isEmpty,
          s"cache manager not empty before capturing $name")
        val got = PlanBudget.hermeticCounts(spark, fn, dir)
        if (got == want) None
        else Some(s"$name: pinned(sh=${want.shuffles},bc=${want.broadcasts}," +
          s"so=${want.sorts},cp=${want.cartesians},jobs=${want.jobs}) got(sh=${got.shuffles}," +
          s"bc=${got.broadcasts},so=${got.sorts},cp=${got.cartesians},jobs=${got.jobs})")
      }
    }
    assert(drifted.isEmpty,
      s"${drifted.size} plan budgets drifted — if intentional, regenerate " +
        s"PLAN_BUDGETS.md via `sbt \"runMain graft.PlanBudget $dir\"`:\n" +
        drifted.mkString("\n"))
  }
}
