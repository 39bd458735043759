package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 builder: turn an append-only change
  * log (key, ts, attributes) into versioned validity intervals — the
  * standard warehouse shape for "what was this entity's state at time
  * t" (which the as-of join then answers in one pass). The reference
  * engine rebuilds entity state by re-running its whole pipeline
  * (`dig-etl-engine`'s KG is last-write-wins, docs/index.md); SCD2 keeps
  * every historical version queryable instead.
  *
  * Semantics (per key, ordered by `ts` then `ord` for determinism):
  *  - consecutive rows with IDENTICAL tracked attributes collapse into
  *    one version (the run's first row opens it);
  *  - each version is valid [valid_from, valid_to) where valid_to is
  *    the next version's valid_from, NULL for the current version;
  *  - `version` numbers versions 1..n per key, `is_current` marks the
  *    open one.
  *
  * Scale: ONE keyed shuffle. Both window passes (change detection,
  * then version numbering + interval close) partition by `key` and
  * sort by (ts, ord) — Catalyst reuses the exchange and the sort, and
  * every frame is running (lag/lead/row_number), so WindowExec streams
  * without buffering whole groups. Attribute comparison is null-safe:
  * the attributes ride in a struct, so a first-row lag-miss (null
  * STRUCT) is distinguishable from a genuinely-null attribute value.
  */
object Scd {

  /** @param changes change log; must carry `key` ++ `ts` ++ `ord` ++ `attrs`
    * @param key     entity key columns
    * @param ts      event-time column (any orderable type)
    * @param ord     tie-break columns for equal `ts` (e.g. a log id)
    * @param attrs   tracked attribute columns; a version closes when any changes
    */
  def buildType2(changes: DataFrame, key: Seq[String], ts: String,
                 ord: Seq[String], attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "at least one tracked attribute")
    require(!changes.columns.contains("__prev"), "__prev is reserved by Scd")
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((ts +: ord).map(col): _*)
    val attrStruct = struct(attrs.map(col): _*)
    changes
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> attrStruct))
      .drop("__prev")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
