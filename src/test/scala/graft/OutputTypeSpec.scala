package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The no-DECIMAL-output gate (r9 VERDICT #1/#3): the driver's
  * correctness hasher canonicalizes decimal128 differently between
  * its Spark-parquet read path and its DuckDB oracle path, so any
  * registry query whose FINAL output schema contains a DecimalType
  * column hash-fails even when every value is bit-identical (proven
  * r9 on `ml_boost`/`ml_boost_deep`/`ml_tree`, the registry's only
  * decimal-typed outputs, via full-registry native-type
  * set-difference). DECIMAL stays the right tool for exact internal
  * math (Σr², cross-multiplied test statistics, EMD numerators);
  * outputs must cast to DOUBLE/BIGINT in the final select on BOTH
  * engines. This spec turns that diagnosis into a permanent gate
  * over the whole registry, nested types included.
  */
class OutputTypeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(path)
    case s: StructType =>
      s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
    case m: MapType =>
      decimalPaths(m.keyType, s"$path.key") ++
        decimalPaths(m.valueType, s"$path.value")
    case _ => Nil
  }

  test("no registry query's output schema contains a DECIMAL column") {
    assume(Files.isDirectory(Paths.get(dir)))
    val spark = SparkSpec.session
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cols = fn(spark, dir).schema.fields.toSeq
          .flatMap(f => decimalPaths(f.dataType, f.name))
        if (cols.isEmpty) Nil else Seq(s"$name: ${cols.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "DECIMAL-typed output columns hash-fail the driver gate even when " +
        "value-exact — cast to DOUBLE/BIGINT in the final select (both " +
        "engines):\n" + offenders.mkString("\n"))
  }
}
