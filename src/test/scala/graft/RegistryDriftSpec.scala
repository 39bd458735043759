package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Round-over-round registry drift gate (r4 post-mortem): 44 of 166
  * registered queries silently vanished from the driver artifacts when
  * a testdata encoding change made them throw at ANALYSIS time — the
  * per-query specs were green against their own fixtures, so nothing
  * in-session caught it.
  *
  * This spec closes the gap from inside the build:
  *   1. every query name that ever earned a green row in a committed
  *      CORRECTNESS_r*.json must still be registered, and
  *   2. every registered query must ANALYZE against the CURRENT
  *      driver testdata (construction runs the analyzer; no jobs for
  *      the lazy majority, bounded driver-side sampling jobs for the
  *      trained-codebook/BPE family).
  */
class RegistryDriftSpec extends AnyFunSuite {

  private val testdata = "/root/testdata/sf0.001"

  private def historicalGreens: Set[String] = {
    val repoRoot = Paths.get(".").toAbsolutePath
    val keyRx = """"([a-z0-9_]+)"\s*:\s*\{""".r
    val files = Option(repoRoot.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json"))
    files.flatMap { f =>
      val txt = new String(Files.readAllBytes(f.toPath), "UTF-8")
      keyRx.findAllMatchIn(txt).map(_.group(1))
    }.toSet
  }

  test("every query name from past correctness artifacts is still registered") {
    val past = historicalGreens
    assume(past.nonEmpty, "no CORRECTNESS_r*.json committed yet")
    val missing = past -- SparkEntry.queries.keySet
    assert(missing.isEmpty,
      s"queries disappeared from the registry since a past round: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every registered query analyzes against the current driver testdata") {
    assume(Files.isDirectory(Paths.get(testdata)), s"$testdata not present")
    val spark = SparkSpec.session
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, testdata).schema; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries no longer analyze against $testdata:\n${failures.mkString("\n")}")
  }

  test("every registered query has an oracle entry or is a documented rows-only check") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries (driver records a weaker check) must stay a
    // short, deliberate list — growth here means silent oracle erosion
    assert(noOracle.subsetOf(Set("ts_trend")),
      s"queries without oracle SQL: ${noOracle.toSeq.sorted.mkString(", ")}")
  }
}
