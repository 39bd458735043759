package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}

class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native simhash64 is bit-identical to the HOF formulation") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val both = docs.select(
      Dedup.simhash64Hof($"text").as("hof"),
      NativeExpressions.simhash64($"text").as("native"))
    assert(both.filter($"hof" =!= $"native").count() == 0)
  }

  test("native dot product matches the sequential fold bit-for-bit") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val both = emb.crossJoin(
        emb.select($"embedding".as("e2"), $"vec_id".as("v2")).limit(5))
      .select(
        Similarity.dotHof($"embedding", $"e2").as("hof"),
        NativeExpressions.dotF($"embedding", $"e2").as("native"))
    assert(both.filter($"hof" =!= $"native").count() == 0)
  }

  test("native minhash signature matches the k-pass HOF formulation") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val sh = array_distinct(graft.functions.TextFunctions.shingles($"text"))
    val both = docs.select(
      Dedup.minhashSigHof(sh, 8).as("hof"),
      NativeExpressions.minhashSig(sh, 8).as("native"))
    assert(both.filter(to_json($"hof") =!= to_json($"native")).count() == 0)
  }

  test("native TextStats matches the composed regex counters") {
    import graft.functions.TextFunctions._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val both = docs.select(
      NativeExpressions.textStats($"text").as("st"),
      tokenCount($"text").as("t"), stopwordCount($"text").as("s"),
      punctCount($"text").as("p"), alnumChars($"text").as("a"))
    assert(both.filter(
      col("st.n_tok") =!= $"t" || col("st.n_stop") =!= $"s" ||
        col("st.n_punct") =!= $"p" || col("st.n_alnum") =!= $"a").count() == 0)
  }

  test("native expressions survive codegen (no fallback errors) and null inputs") {
    val df = Seq(Some("hash join scan"), None).toDF("t")
    val out = df.select(NativeExpressions.simhash64($"t").as("s")).collect()
    assert(out(0).getString(0).matches("[01]{64}"))
    assert(out(1).isNullAt(0))
  }
}
