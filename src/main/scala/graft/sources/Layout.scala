package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical table layout for co-located joins (builder brief:
  * "broadcast() for small dims, repartition()/bucketing for co-located
  * joins"). At 100 TB the dominant cost of a fact ⨝ fact join is the
  * shuffle of BOTH sides; bucketing pays that shuffle ONCE at write
  * time and every subsequent equi-join on the bucket keys plans with
  * ZERO Exchange — Spark's scan reports the bucket spec as its output
  * partitioning, so SortMergeJoin consumes both sides in place. The
  * per-bucket `sortBy` pre-pays the merge sort as well, though Spark
  * ≥3.0 only consumes that ordering behind
  * `spark.sql.legacy.bucketedTableScan.outputOrdering` — without it
  * the join keeps an in-partition (shuffle-free, cheap) Sort.
  *
  * Contract for the shuffle-free plan: both tables bucketed by the
  * SAME keys into the SAME bucket count, the join is an equi-join on
  * exactly those keys, and `spark.sql.sources.bucketing.enabled` is on
  * (default). A mismatched bucket count degrades gracefully — Spark
  * re-shuffles the smaller side only.
  */
object Layout {

  /** Write `df` as a bucketed + per-bucket-sorted external table at
    * `path`, registered as `table` in the session catalog. Buckets are
    * hash(keys) % n — the same hash partitioning an equi-join shuffle
    * would produce, which is exactly why the join can skip it.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keys: Seq[String], numBuckets: Int): Unit = {
    require(keys.nonEmpty && numBuckets > 0)
    import org.apache.spark.sql.functions.col
    // repartition on the bucket keys with numBuckets partitions: Spark's
    // repartition hash and its bucketing hash agree, so each write task
    // holds exactly one bucket → ONE file per bucket. With multiple
    // files per bucket the scan cannot trust per-bucket sortedness and
    // re-inserts Sort nodes under the join; one file per bucket also
    // avoids the small-files problem bucketed writes are prone to.
    df.repartition(numBuckets, keys.map(col): _*)
      .write
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on their bucket keys: with both
    * sides bucketed alike this plans as Exchange-free SortMergeJoin.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** Z-order (Morton) clustering key: interleave the low `bits` bits
    * of two dimensions so range-partitioning and sorting by the single
    * z value co-locates rows close in BOTH dimensions — parquet
    * min/max stats then prune scans filtered on either one. The
    * multi-dimensional companion to [[writeBucketed]]'s single-key
    * layout: `df.repartitionByRange(col("z")).sortWithinPartitions
    * ("z").write.parquet(...)` is the 100 TB write path.
    *
    * Pure integer bit math (shift/mask/sum), so the clustering key is
    * reproducible anywhere — including the DuckDB oracle.
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(bits > 0 && bits <= 31, "bits must be in [1,31]")
    // bits <= 31 keeps every term below 2^63: no overflow possible
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
