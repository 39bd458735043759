package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series enrichment join Spark lacks
  * natively (builder brief: "an operator the reference/Spark lacks,
  * e.g. as-of join"): every left row is matched to the SINGLE right
  * row with the greatest `ts` ≤ the left row's `ts` within the same
  * key group (inclusive, the DuckDB/kdb ASOF convention).
  *
  * Composition, not a custom exec (preference tier (a)): tag the two
  * sides, union by name, and take `last(payload, ignoreNulls)` over a
  * per-key window ordered by (ts, tag) with right rows sorting BEFORE
  * left rows at equal ts — the running "latest right value seen".
  * That is exactly ONE shuffle on the key — the minimum any as-of
  * join needs — with no range self-join blowup and no per-row
  * subquery; at 100 TB both sides co-partition on the key and the
  * window is a linear scan per group. (A custom SortMergeAsOfExec
  * could fuse the union sort, but it would not remove the shuffle —
  * measured plans keep the whole merge in one stage already.)
  *
  * Contract: `right` must be unique per (key, ts) — deduplicate first
  * (e.g. keep the max payload id per key+ts) or matches at duplicated
  * timestamps are nondeterministic.
  */
object AsOf {

  /** @param key     equi-join key columns present on both sides
    * @param ts      ordering column name present on both sides
    * @param payload right-side columns carried onto matched left rows
    *                (emitted as `asof_<name>`, null when no right row
    *                precedes the left row)
    */
  def joinBackward(left: DataFrame, right: DataFrame, key: Seq[String],
                   ts: String, payload: Seq[String]): DataFrame = {
    // a payload column that ALSO exists on the left would make every
    // left row "match" its own value through last(ignoreNulls) —
    // silent corruption, so fail loudly instead
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"payload columns ${clash.mkString(",")} exist on the left side — alias them on the right")
    require(!left.columns.contains("__tag") && !right.columns.contains("__tag"),
      "__tag is reserved by AsOf.joinBackward")
    val l = left.withColumn("__tag", lit(1))
    // project right to its contract columns: any other right column
    // would otherwise ride through unionByName as an all-null output
    // column nobody asked for
    val r = right.select((key :+ ts) ++ payload map col: _*)
      .withColumn("__tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(ts).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    withAsof.filter(col("__tag") === 1)
      .drop("__tag" +: payload: _*)
  }

  /** Forward as-of join: each left row matched to the single right row
    * with the SMALLEST ts ≥ its own within the key group (inclusive) —
    * the mirror of [[joinBackward]], same one-shuffle shape.
    *
    * Formulated as a running `last` over ts DESCENDING with an
    * `unboundedPreceding → currentRow` frame (right rows sorting
    * before left rows at equal ts, so an equal-timestamp right row is
    * in the frame). A running frame streams through WindowExec with
    * O(1) state per group; the naive mirror — `first(...)` over
    * `currentRow → unboundedFollowing` — buffers each group's tail in
    * memory, which degrades to one task holding the whole partition
    * on a degenerate hot key.
    */
  def joinForward(left: DataFrame, right: DataFrame, key: Seq[String],
                  ts: String, payload: Seq[String]): DataFrame = {
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"payload columns ${clash.mkString(",")} exist on the left side — alias them on the right")
    require(!left.columns.contains("__tag") && !right.columns.contains("__tag"),
      "__tag is reserved by AsOf.joinForward")
    val l = left.withColumn("__tag", lit(1))
    val r = right.select((key :+ ts) ++ payload map col: _*)
      .withColumn("__tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // ts DESC scan: the running "latest right seen" is the right row
    // with the smallest ts ≥ the current left row's ts
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(ts).desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    withAsof.filter(col("__tag") === 1)
      .drop("__tag" +: payload: _*)
  }
}
