package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder brief: "skewed keys →
  * salting or AQE skew-join"). AQE handles sort-merge skew splitting
  * automatically; explicit salting is for the cases AQE can't touch —
  * e.g. a broadcast-unfriendly dimension joined on a power-law key.
  *
  * Deterministic salting: the big side salts by a hash of its whole
  * row identity (stable, no RNG), the small side replicates each key
  * `salts` times. Join key becomes (key, salt) — hot keys spread over
  * `salts` reducers.
  */
object Skew {

  /** Equi-join `big ⨝ small` on `key`, salted `salts` ways. `bigIdCols`
    * give the deterministic per-row salt source.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, bigIdCols: Seq[Column]): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(bigIdCols: _*), lit(salts)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew diagnosis: per-key share of rows — keys above `threshold`
    * share are salting candidates. ONE scan of the (by definition
    * large, skewed) input: the total derives from the cached per-key
    * counts, not a second full count() job.
    */
  def hotKeys(df: DataFrame, key: String, threshold: Double = 0.01): DataFrame = {
    val spark = df.sparkSession
    val grouped = df.groupBy(col(key)).agg(count(lit(1)).as("cnt")).cache()
    try {
      val totalRow = grouped.agg(sum(col("cnt"))).head()
      val total = if (totalRow.isNullAt(0)) 0.0 else totalRow.getLong(0).toDouble
      val hot = grouped
        .withColumn("share", col("cnt") / lit(total))
        .filter(col("share") >= threshold)
        .orderBy(col("cnt").desc)
      // ≤ 1/threshold keys can each hold ≥ threshold share, so this
      // collect is bounded by construction; materializing eagerly lets
      // the cached per-key counts be released instead of pinning
      // executor storage for the caller's lifetime (ADVICE r2).
      val rows = if (total == 0.0) Array.empty[org.apache.spark.sql.Row] else hot.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), hot.schema)
    } finally grouped.unpersist(false)
  }
}
