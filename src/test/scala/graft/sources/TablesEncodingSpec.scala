package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** `Tables.apply` must normalize every timestamp encoding the driver has
  * ever shipped for `events.ts` to a plain session-UTC `TimestampType`:
  *
  *   1. parquet TIMESTAMP(NANOS) read as a raw Long
  *      (`spark.sql.legacy.parquet.nanosAsLong`) — rounds 1-3 testdata;
  *   2. parquet timestamp[us] with isAdjustedToUTC=false, which Spark 4
  *      reads as TIMESTAMP_NTZ — round-4+ testdata;
  *   3. an already-zoned TimestampType, which must pass through unchanged.
  *
  * Round 4 regression: case 2 was unhandled, so every `unix_millis(ts)`
  * call site threw DATATYPE_MISMATCH (44 driver queries + 12 suites).
  */
class TablesEncodingSpec extends SparkSpec {
  import spark.implicits._

  private def writeAndLoad(writeDdl: String, rows: String): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("tables-enc").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}"
    spark.sql(s"SELECT * FROM VALUES $rows AS t(event_id, ts)")
      .selectExpr("event_id", writeDdl)
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    Tables(spark, path, "events")
  }

  test("nanos-as-long encoding normalizes to TimestampType with floor semantics") {
    // 1_500_000_500ns -> 1_500_000µs (floor), -1_500ns -> -2µs (floor, not trunc)
    val df = writeAndLoad("CAST(ts AS BIGINT) AS ts", "(1L, 1500000500L), (2L, -1500L)")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("event_id").select(unix_micros($"ts")).as[Long].collect()
    assert(got.toSeq == Seq(1500000L, -2L))
  }

  test("TIMESTAMP_NTZ encoding (round-4 testdata) normalizes to TimestampType, values preserved") {
    val df = writeAndLoad(
      "CAST(timestamp_micros(CAST(ts AS BIGINT)) AS TIMESTAMP_NTZ) AS ts",
      "(1L, 1700000000000000L), (2L, -5L)")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("event_id").select(unix_micros($"ts")).as[Long].collect()
    assert(got.toSeq == Seq(1700000000000000L, -5L))
  }

  test("plain TimestampType passes through unchanged") {
    val df = writeAndLoad("timestamp_micros(CAST(ts AS BIGINT)) AS ts", "(1L, 42L)")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros($"ts")).as[Long].head() == 42L)
  }

  test("the driver's current sf0.001 events table loads with a usable ts column") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_millis($"ts")).limit(1).count() == 1)
  }
}
