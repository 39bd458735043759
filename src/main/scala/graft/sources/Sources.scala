package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** File sources/sinks (SURVEY §2.1, S1–S10) re-expressed on Spark
  * readers. The reference's ingest contract: every input becomes CDR
  * docs (`doc_id`, `raw_content`, `dataset`, ...) on one stream.
  */
object Sources {

  /** S1 JSON-lines source (docs/advanced.md:204-206): one doc per line,
    * .gz transparent. Schema may be supplied (declared per-dataset
    * StructType, SURVEY §1.1) or inferred.
    */
  def jsonLines(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S2 CSV/TSV source (dig_tabular_import.py:124-160): header row, all
    * columns kept as strings (the reference does no type detection),
    * configurable delimiter/encoding. `.tab` == TSV.
    */
  def csv(spark: SparkSession, path: String, delimiter: String = ",",
          encoding: String = "UTF-8", header: Boolean = true): DataFrame =
    spark.read
      .option("header", header)
      .option("delimiter", delimiter)
      .option("encoding", encoding)
      .option("inferSchema", false) // all-strings parity
      .csv(path)

  /** S5 HTML file source (docs/advanced.md:297-308): whole file →
    * `raw_content` + dataset tag.
    */
  def htmlFiles(spark: SparkSession, path: String, dataset: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .withColumnRenamed("value", "raw_content")
      .withColumn("dataset", lit(dataset))
      .withColumn("doc_id", sha2(col("raw_content"), 256))

  /** S6 raw-dir export source (export_raw_data.py:23-41): `<stem>.json`
    * metadata joined with `<stem>.html` payload by filename stem.
    */
  def rawDirPairs(spark: SparkSession, dir: String): DataFrame = {
    val stem = (c: org.apache.spark.sql.Column) =>
      regexp_extract(c, "([^/]+)\\.[a-z]+$", 1)
    val meta = spark.read.json(s"$dir/*.json")
      .withColumn("__stem", stem(input_file_name()))
    val html = spark.read.option("wholetext", true).text(s"$dir/*.html")
      .select(col("value").as("raw_content"), stem(input_file_name()).as("__stem"))
    meta.join(html, "__stem").drop("__stem")
  }

  /** S9/A5 idempotent upsert sink: last-write-wins per doc_id (the
    * Logstash `document_id => %{doc_id}` semantics, manager.py:216-217).
    * Partitioned parquet table replaces the ES index (S10): partition
    * pruning on `dataset` gives the per-project index routing.
    */
  def upsert(existing: Option[DataFrame], incoming: DataFrame,
             idCol: String, versionCol: String): DataFrame = {
    val all = existing.fold(incoming)(_.unionByName(incoming, allowMissingColumns = true))
    // version ties (coarse timestamps are common) need a deterministic
    // tiebreak or the surviving row depends on task ordering — a stable
    // content hash makes repeated runs of the same upsert idempotent,
    // the semantics this sink exists to provide. Hash the row's JSON,
    // not the raw columns: xxhash64 rejects MapType columns and this
    // sink must accept arbitrary doc schemas.
    val contentTieBreak =
      xxhash64(to_json(struct(all.columns.map(col).toIndexedSeq: _*)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(versionCol).desc, contentTieBreak)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** S9 upsert at document granularity for long-format tables (multiple
    * rows per doc_id, e.g. the KG value table): a re-delivered document
    * replaces ALL its previous rows (anti-join out, union in) — the
    * exact ES `document_id => %{doc_id}` semantics for nested docs.
    */
  def upsertDocs(existing: DataFrame, incoming: DataFrame, idCol: String): DataFrame = {
    val replaced = incoming.select(col(idCol)).distinct()
    existing.join(replaced, Seq(idCol), "left_anti")
      .unionByName(incoming, allowMissingColumns = true)
  }

  /** S10 catalog bootstrap: register the project table (idempotent). */
  def bootstrapTable(spark: SparkSession, name: String, path: String): Unit =
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$path'")

  /** Wrap any tabular frame as CDR docs (SURVEY §3.1 step 2): nest row
    * under `prefix`, synthesize url/doc_id (P13), tag the dataset.
    */
  def toCdr(df: DataFrame, prefix: String, baseUrl: String): DataFrame = {
    val payload = to_json(struct(df.columns.map(col).toIndexedSeq: _*))
    df.select(
      struct(df.columns.map(col).toIndexedSeq: _*).as(prefix),
      payload.as("raw_content"))
      .withColumn("doc_id", sha2(col("raw_content"), 256))
      .withColumn("url", concat(lit(baseUrl), lit("#"), col("doc_id").substr(1, 16)))
      .withColumn("dataset", lit(prefix))
  }
}
