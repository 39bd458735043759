package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators take the table directory as a parameter so the same code
  * runs at any scale factor — and, on a real cluster, against any
  * warehouse path. Reads are plain parquet scans: column pruning and
  * predicate pushdown reach the scan via Catalyst (verified with
  * `.explain("formatted")` — see `PlanSpec`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The driver's events table stores TIMESTAMP(NANOS), which Spark 4 only
    // reads as a long (spark.sql.legacy.parquet.nanosAsLong). Normalize to
    // TimestampType (µs, floor) so every operator sees a real timestamp.
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      // FLOOR division, not `div` (truncation): pre-epoch nanoseconds
      // would truncate toward zero (-1500ns -> -1µs) while DuckDB's
      // native ns timestamps floor (-2µs), shifting every oracle compare
      // by one unit on pre-1970 data
      case Some(LongType) => df.withColumn("ts", timestamp_micros(
        expr("CASE WHEN ts >= 0 THEN ts div 1000 ELSE -((-ts + 999) div 1000) END")))
      // parquet timestamp[us] with isAdjustedToUTC=false reads as
      // TIMESTAMP_NTZ under Spark 4. The session runs in UTC (see
      // sessionDefaults), so the wall-clock reinterpretation cast is
      // value-preserving: every downstream unix_millis/unix_micros call
      // sees the same instants DuckDB computes natively.
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Round-robin-spread `df` across the session's full width when its
    * natural scan parallelism is BELOW the core count — the small-SF
    * hazard where a table fits one parquet split and every downstream
    * per-row kernel (shingling, minhash, tokenize+md5) runs in a single
    * task (r12 profile: dedup_cluster's whole LSH pipeline on one core,
    * 31 idle). At scale the natural split count exceeds the session
    * width and this is a NO-OP — no exchange enters the plan. Guide
    * §2.5: "input skew: repartition immediately after the read".
    */
  def spreadToWidth(df: DataFrame): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < width) df.repartition(width) else df
  }

  /** Session settings every graft session needs (nanos timestamps, UTC). */
  def sessionDefaults(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")

  /** Register every table as a temp view (used by tests and the SQL path). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
