package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — with [[AsOf]], the second
  * time-series join Spark lacks natively (builder brief: "as-of join,
  * range join"): every left row (key, ts) is matched to each right
  * interval (key, start, end) that CONTAINS its timestamp
  * (inclusive both ends).
  *
  * Spark's own plan for the theta join
  * `l.key = r.key AND l.ts BETWEEN r.start AND r.end` is a
  * BroadcastNestedLoop (or per-key cartesian) — per-key quadratic,
  * hopeless at 100 TB. The scale shape here is bucketization: time is
  * cut into fixed `bucketMs` buckets; each interval explodes to every
  * bucket it overlaps (bounded by span/bucketMs + 1 rows), each point
  * maps to exactly ONE bucket, and the join becomes an EQUI-join on
  * (key, bucket) + an exact containment filter. Because a point lives
  * in a single bucket, every (point, interval) pair meets exactly
  * once — no post-join dedup. Cost: one keyed shuffle per side and
  * candidates bounded by per-bucket occupancy, never |L|×|R|.
  *
  * Choosing `bucketMs`: of the order of the MEDIAN interval width.
  * Too small → interval explosion rows (span/bucketMs each); too
  * large → more false candidates for the containment filter. Both
  * degrade linearly, so the choice is forgiving; degenerate
  * corpus-spanning intervals belong on the broadcast side of a plain
  * theta join instead (they defeat any bucketing scheme).
  */
object IntervalJoin {

  /** @param left     point side; must carry `key` ++ `ts`
    * @param right    interval side; must carry `key` ++ `start`,`end`
    *                 (same unit as `ts`, both ends inclusive) plus any
    *                 payload columns to emit
    * @param key      equi-join key columns present on both sides
    * @param ts       left timestamp column (numeric, e.g. epoch ms)
    * @param start    right interval start column
    * @param end      right interval end column
    * @param bucketMs bucket width in `ts` units
    */
  def joinPointInInterval(left: DataFrame, right: DataFrame,
                          key: Seq[String], ts: String,
                          start: String, end: String,
                          bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "__bucket is reserved by IntervalJoin")
    val lb = left.withColumn("__bucket", floor(col(ts) / bucketMs))
    val rb = right
      // empty intervals (end < start) explode to no buckets instead of
      // tripping sequence()'s negative-step error
      .filter(col(end) >= col(start))
      .withColumn("__bucket",
        explode(sequence(floor(col(start) / bucketMs), floor(col(end) / bucketMs))))
    lb.join(rb, key :+ "__bucket")
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("__bucket")
  }

  /** Interval×interval OVERLAP join: every left interval
    * (key, lstart, lend) is matched to each right interval
    * (key, rstart, rend) it overlaps (closed intervals:
    * `lstart <= rend AND rstart <= lend`).
    *
    * Same bucketization as [[joinPointInInterval]], with one twist:
    * two overlapping intervals share EVERY bucket their overlap spans,
    * so a naive bucket equi-join emits the pair once per shared bucket.
    * Instead of a post-join `distinct` (a second shuffle over the
    * result), each pair is kept only in its CANONICAL bucket — the one
    * containing the overlap's start `greatest(lstart, rstart)`. That
    * bucket is always shared (it lies in both intervals), so every
    * overlapping pair survives exactly once and the join stays one
    * keyed shuffle per side with no result-side dedup.
    */
  def joinIntervalOverlap(left: DataFrame, right: DataFrame,
                          key: Seq[String],
                          lstart: String, lend: String,
                          rstart: String, rend: String,
                          bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "__bucket is reserved by IntervalJoin")
    val lb = left.filter(col(lend) >= col(lstart))
      .withColumn("__bucket",
        explode(sequence(floor(col(lstart) / bucketMs), floor(col(lend) / bucketMs))))
    val rb = right.filter(col(rend) >= col(rstart))
      .withColumn("__bucket",
        explode(sequence(floor(col(rstart) / bucketMs), floor(col(rend) / bucketMs))))
    lb.join(rb, key :+ "__bucket")
      .filter(col(lstart) <= col(rend) && col(rstart) <= col(lend) &&
        col("__bucket") === floor(greatest(col(lstart), col(rstart)) / bucketMs))
      .drop("__bucket")
  }
}
