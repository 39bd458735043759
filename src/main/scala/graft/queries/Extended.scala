package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.extract.Extractors
import graft.operators.{KgOps, Similarity}

/** Second-wave oracle coverage: embedding near-dup pairs (builder brief
  * dedup method #5), P2 row-range slice, E5 date battery, E9 hostname.
  */
object Extended {

  /** Embedding-cosine near-dup via banded sign-random-projection LSH
    * (8 planes, 2 OR-ed 4-bit bands): candidate pairs that share any
    * band have their exact cosine verified; pairs dedup on ids before
    * the embedding arrays join back. Plane/band counts are parameters
    * of [[Similarity.lshNearDupPairs]] — at 100 TB bits-per-band grows
    * as log2(N/targetBucket) so within-bucket pairing stays linear.
    */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDupPairs(Tables(s, dir, "embeddings"), nPlanes = 8, bands = 2)
      .filter(col("cos") > 0.5)
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(200)

  val dedupEmbeddingSql: String = {
    val dot = (x: String, y: String) =>
      s"list_reduce(list_transform(range(len($x)), i -> " +
        s"CAST($x[i+1] AS DOUBLE) * CAST($y[i+1] AS DOUBLE)), (p, q) -> p + q)"
    val planeDot =
      "list_reduce(list_transform(range(len(embedding)), d -> " +
        "CAST(embedding[d+1] AS DOUBLE) * " +
        "((strpos('0123456789abcdef', substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) - 1)" +
        " / 7.5 - 1.0)), (p, q) -> p + q)"
    s"""WITH sig AS (SELECT vec_id, embedding, array_to_string(list_transform(range(8), j ->
       |    CASE WHEN $planeDot > 0 THEN '1' ELSE '0' END), '') AS sig FROM embeddings),
       |nrm AS (SELECT vec_id, ${dot("embedding", "embedding")} AS n2 FROM embeddings),
       |bands AS (SELECT vec_id, b, substr(sig, CAST(b * 4 + 1 AS INT), 4) AS bits
       |  FROM sig, range(2) t(b)),
       |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.bits = y.bits
       |  WHERE x.vec_id < y.vec_id)
       |SELECT c.id_a, c.id_b,
       |  ${dot("a.embedding", "b.embedding")} / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
       |FROM cand c, sig a, sig b, nrm na, nrm nb
       |WHERE a.vec_id = c.id_a AND b.vec_id = c.id_b
       |  AND na.vec_id = c.id_a AND nb.vec_id = c.id_b
       |  AND ${dot("a.embedding", "b.embedding")} / (sqrt(na.n2) * sqrt(nb.n2)) > 0.5
       |ORDER BY cos DESC, id_a, id_b LIMIT 200""".stripMargin
  }

  /** P2 row-range slice over an explicit deterministic ordering. */
  def ruleRowslice(s: SparkSession, dir: String): DataFrame = {
    // The synthetic lineitem is NOT unique on (orderkey, linenumber) —
    // row numbers need a total order, so break ties on every key-ish
    // column (random doubles make full ties vanishingly unlikely).
    //
    // Scale shape: a global rank 101..150 does NOT need a global sort.
    // orderBy(...).limit(150) plans as TakeOrderedAndProject — each
    // partition keeps its local top-150, the driver merges 150-row
    // heaps — then row numbers are assigned on the 150-row result.
    // The explicit repartition(1) bounds the global window's input by
    // construction (150 rows), instead of the earlier non-foldable
    // pmod(col,1) partition-key trick that relied on
    // EliminateWindowPartitions NOT folding it — version-fragile.
    val keys = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"), col("l_extendedprice"), col("l_quantity"))
    val w = Window.orderBy(keys: _*)
    Tables(s, dir, "lineitem")
      .orderBy(keys: _*)
      .limit(150)
      .repartition(1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn").between(101, 150))
      .select(col("rn"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  }

  val ruleRowsliceSql: String =
    """SELECT rn, l_orderkey, l_linenumber, l_quantity FROM (
      |  SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey,
      |      l_suppkey, l_extendedprice, l_quantity) AS rn,
      |    l_orderkey, l_linenumber, l_quantity FROM lineitem)
      |WHERE rn BETWEEN 101 AND 150 ORDER BY rn""".stripMargin

  /** E5 date battery: multi-format parse back to a canonical date. */
  def extractDates(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .withColumn("s1", date_format(col("o_orderdate"), "MM/dd/yyyy"))
      .withColumn("s2", date_format(col("o_orderdate"), "yyyy-MM-dd"))
    o.select(
      col("o_orderkey"),
      date_format(Extractors.parseDate(col("s1")), "yyyy-MM-dd").as("d1"),
      date_format(Extractors.parseDate(col("s2")), "yyyy-MM-dd").as("d2"))
      .orderBy(col("o_orderkey"))
  }

  val extractDatesSql: String =
    """SELECT o_orderkey,
      |  strftime(strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y'), '%Y-%m-%d') AS d1,
      |  strftime(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d'), '%Y-%m-%d') AS d2
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** E9 hostname/TLD extraction over synthesized urls. */
  def extractHostname(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    Tables(s, dir, "documents")
      .withColumn("url", concat(lit("https://"), col("source"),
        lit(".example.org/doc/"), col("doc_id").cast("string")))
      .select(TextFunctions.hostname(col("url")).as("host"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("host"))
  }

  val extractHostnameSql: String =
    """SELECT regexp_extract('https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR),
      |    'https?://([^/\s:]+)', 1) AS host, COUNT(*) AS cnt
      |FROM documents GROUP BY 1 ORDER BY host""".stripMargin

  /** E11/J2 KG node split: nest each customer's orders as child structs,
    * promote them to standalone child docs with sha identity + parent
    * FK, then re-join to the parent (the full split/reassemble cycle).
    * Doubles are excluded from the child payload so the JSON identity
    * hash is engine-portable.
    */
  def kgNodeSplit(s: SparkSession, dir: String): DataFrame = {
    val parents = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(col("o_orderkey"), col("o_orderstatus"))))
        .as("children"))
    val children = KgOps.nodeSplit(parents, "o_custkey", "children", "orders/child")
    children
      .groupBy(col("parent_doc_id"), col("dataset_identifier"))
      .agg(count(lit(1)).as("n_children"),
        min(col("doc_id")).as("first_child_id"))
      .orderBy(col("parent_doc_id").cast("long"))
  }

  val kgNodeSplitSql: String =
    """WITH ch AS (
      |  SELECT CAST(o_custkey AS VARCHAR) AS parent_doc_id,
      |    'orders/child' AS dataset_identifier,
      |    sha256('orders/child' || ':' || CAST(o_custkey AS VARCHAR) || ':' ||
      |      to_json(struct_pack(o_orderkey := o_orderkey, o_orderstatus := o_orderstatus))) AS doc_id
      |  FROM orders)
      |SELECT parent_doc_id, dataset_identifier, COUNT(*) AS n_children,
      |  min(doc_id) AS first_child_id
      |FROM ch GROUP BY 1, 2 ORDER BY CAST(parent_doc_id AS BIGINT)""".stripMargin

  /** E10 HTML table extractor: per-document HTML (synthesized
    * deterministically from the row so the oracle can state the exact
    * expected grid in closed form) → cell grid via nested
    * index-carrying transforms. Two tables per page — a 2x2 header/data
    * table and a 1x1 — exercising multi-table, th/td and nested-markup
    * stripping.
    */
  def extractTables(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><body><table class=\"x\"><tr><th>Lang</th><th>Source</th></tr><tr><td>"),
      col("lang"), lit("</td><td><b>"), col("source"),
      lit("</b></td></tr></table><p>between</p><table><tr><td>"),
      col("doc_id").cast("string"), lit("</td></tr></table></body></html>"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(Extractors.htmlTables(html)).as("cell"))
      .select(col("doc_id"), col("cell.table_idx").as("table_idx"),
        col("cell.row_idx").as("row_idx"), col("cell.col_idx").as("col_idx"),
        col("cell.text").as("text"))
      .orderBy(col("doc_id"), col("table_idx"), col("row_idx"), col("col_idx"))
  }

  val extractTablesSql: String =
    """SELECT doc_id, table_idx, row_idx, col_idx, text FROM (
      |  SELECT doc_id, 0 AS table_idx, 0 AS row_idx, 0 AS col_idx, 'Lang' AS text FROM documents
      |  UNION ALL SELECT doc_id, 0, 0, 1, 'Source' FROM documents
      |  UNION ALL SELECT doc_id, 0, 1, 0, lang FROM documents
      |  UNION ALL SELECT doc_id, 0, 1, 1, source FROM documents
      |  UNION ALL SELECT doc_id, 1, 0, 0, CAST(doc_id AS VARCHAR) FROM documents)
      |ORDER BY doc_id, table_idx, row_idx, col_idx""".stripMargin

  /** Z-order clustering key over events ([[graft.sources.Layout
    * .zValue]] — 16-bit user × day Morton interleave): the write-side
    * layout that lets parquet min/max prune scans on EITHER dimension.
    * The query emits the clustering order itself (z, then id), which
    * is exactly what `repartitionByRange(z) + sortWithinPartitions`
    * writes at scale; the oracle recomputes the interleave with plain
    * integer bit math.
    */
  def layoutZorder(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        (unix_millis(col("ts")) / 86400000L).cast("long").as("day"))
    ev.select(col("event_id"),
        graft.sources.Layout.zValue(
          col("user_id").bitwiseAND(lit(65535L)),
          col("day").bitwiseAND(lit(65535L)), bits = 16).as("z"))
      .orderBy(col("z"), col("event_id"))
  }

  val layoutZorderSql: String = {
    // explicit parens around every shift so << binds before +
    val zExpr = (0 until 16).map { i =>
      s"((((user_id & 65535) >> $i) & 1) << ${2 * i})" +
        s" + (((((epoch_ms(ts) // 86400000) & 65535) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"SELECT event_id, ($zExpr) AS z FROM events ORDER BY z, event_id"
  }

  /** Hilbert-curve clustering key over the same (user × day) grid as
    * [[layoutZorder]] — the layout with strictly better locality
    * guarantees (every curve step is an ADJACENT cell, so range reads
    * touch contiguous runs; Morton has diagonal jumps). Computed by
    * the native integer rotate/reflect loop
    * ([[graft.plans.NativeExpressions.hilbertCompute]]); the oracle
    * replays the 16 unrolled steps as a packed-xy struct fold (the
    * swap is a 2-cycle, so x and y travel in ONE accumulator slot —
    * the ts_cusum sequential-struct_pack lesson).
    */
  def layoutHilbert(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        (unix_millis(col("ts")) / 86400000L).cast("long").as("day"))
    ev.select(col("event_id"),
        graft.plans.NativeExpressions.hilbertIndex(
          col("user_id").bitwiseAND(lit(65535L)),
          col("day").bitwiseAND(lit(65535L)), bits = 16).as("h"))
      .orderBy(col("h"), col("event_id"))
  }

  val layoutHilbertSql: String = {
    val steps = (0 until 16).map(i => (1L << (15 - i)).toString).mkString(", ")
    s"""SELECT event_id, (list_reduce(
       |  list_prepend(struct_pack(d := CAST(0 AS BIGINT),
       |      xy := (user_id & 65535) * 65536 + ((epoch_ms(ts) // 86400000) & 65535)),
       |    list_transform([$steps], s -> struct_pack(d := CAST(s AS BIGINT), xy := CAST(0 AS BIGINT)))),
       |  (acc, el) -> struct_pack(
       |    d := acc.d + el.d * el.d * (CASE
       |      WHEN ((acc.xy // 65536) & el.d) <> 0 AND ((acc.xy % 65536) & el.d) <> 0 THEN 2
       |      WHEN ((acc.xy // 65536) & el.d) <> 0 THEN 3
       |      WHEN ((acc.xy % 65536) & el.d) <> 0 THEN 1
       |      ELSE 0 END),
       |    xy := (CASE WHEN ((acc.xy % 65536) & el.d) <> 0 THEN acc.xy // 65536
       |        WHEN ((acc.xy // 65536) & el.d) <> 0 THEN 65535 - (acc.xy % 65536)
       |        ELSE acc.xy % 65536 END) * 65536
       |      + (CASE WHEN ((acc.xy % 65536) & el.d) <> 0 THEN acc.xy % 65536
       |        WHEN ((acc.xy // 65536) & el.d) <> 0 THEN 65535 - (acc.xy // 65536)
       |        ELSE acc.xy // 65536 END)))).d AS h
       |FROM events ORDER BY h, event_id""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_hilbert" -> (layoutHilbert _),
    "layout_zorder" -> (layoutZorder _),
    "dedup_embedding" -> (dedupEmbedding _),
    "rule_rowslice" -> (ruleRowslice _),
    "extract_dates" -> (extractDates _),
    "extract_hostname" -> (extractHostname _),
    "extract_tables" -> (extractTables _),
    "kg_node_split" -> (kgNodeSplit _))

  val oracles: Map[String, String] = Map(
    "layout_hilbert" -> layoutHilbertSql,
    "layout_zorder" -> layoutZorderSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "rule_rowslice" -> ruleRowsliceSql,
    "extract_dates" -> extractDatesSql,
    "extract_hostname" -> extractHostnameSql,
    "extract_tables" -> extractTablesSql,
    "kg_node_split" -> kgNodeSplitSql)
}
