package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KG construction operators beyond scalar extraction (SURVEY §2.3
  * E11/E12, §2.5 J1/J2).
  */
object KgOps {

  /** E11/J2 create_kg_node: promote a nested array-of-struct column to
    * standalone child docs with synthesized doc_id and a parent FK
    * (generate_mydig_config.py:211-219). The child Dataset re-joins the
    * parent on `parent_doc_id` (1:N, equi-join).
    */
  def nodeSplit(docs: DataFrame, idCol: String, nestedArrayCol: String,
                childDataset: String): DataFrame = {
    docs
      .select(col(idCol).cast("string").as("parent_doc_id"),
        explode(col(nestedArrayCol)).as("child"))
      .withColumn("doc_id",
        sha2(concat_ws(":", lit(childDataset), col("parent_doc_id"),
          // ignoreNullFields=false: Spark's default DROPS null struct
          // fields while DuckDB's to_json emits "field":null — the
          // content-hash ids would diverge on any null child field
          to_json(col("child"),
            java.util.Map.of("ignoreNullFields", "false"))), 256))
      .withColumn("dataset_identifier", lit(childDataset))
      .select(col("doc_id"), col("parent_doc_id"), col("dataset_identifier"), col("child.*"))
  }

  /** E12 add_constant_kg enhancement: ordered constant-field injection
    * with guards on dataset_identifier (generate_mydig_config.py:433-465;
    * test_kg_enhancement.py). Priority = application order: earlier
    * rules win (later rules only fill still-null slots).
    */
  final case class Enhancement(field: String, value: String, guardDataset: Option[String])

  def enhance(docs: DataFrame, rules: Seq[Enhancement]): DataFrame =
    rules.foldLeft(docs) { case (d, r) =>
      val guard = r.guardDataset
        .map(g => col("dataset_identifier") === g)
        .getOrElse(lit(true))
      // the constant fills typed as the EXISTING column's type — a bare
      // string literal would coerce a numeric column to string for
      // every row (or fail under ANSI) just to null-fill it
      val (existing, fill) = d.schema.fields.find(_.name == r.field) match {
        case Some(f) => (col(r.field), lit(r.value).cast(f.dataType))
        case None => (lit(null).cast("string"), lit(r.value))
      }
      d.withColumn(r.field, when(guard && existing.isNull, fill).otherwise(existing))
    }

  /** J1 join_indexing: hoist child-struct fields to searchable top-level
    * `<child>__<field>` columns (generate_mydig_config.py:467-516) —
    * denormalization before the split, so no runtime join at query time.
    */
  def joinIndexing(docs: DataFrame, childCol: String, fields: Seq[String]): DataFrame =
    fields.foldLeft(docs) { (d, f) =>
      d.withColumn(s"${childCol}__$f", col(s"$childCol.$f"))
    }

  /** Q2 constraint-value normalizers: the reference string-evals Python
    * here (constraint_type_transformations.json); we ship a whitelist
    * (SURVEY §7 hard parts — no eval).
    */
  val Normalizers: Map[String, String => String] = Map(
    "lower" -> (_.toLowerCase),
    "trim" -> (_.trim),
    "strip_stopwords" -> { v =>
      val stop = graft.functions.TextFunctions.Stopwords.toSet
      v.split("\\s+").filterNot(t => stop.contains(t.toLowerCase)).mkString(" ")
    },
    "digits_only" -> (_.replaceAll("\\D", "")))

  def normalize(names: Seq[String])(value: String): String =
    names.foldLeft(value)((v, n) => Normalizers.getOrElse(n, identity[String] _)(v))
}
