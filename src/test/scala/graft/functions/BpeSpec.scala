package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The BPE trainer/encoder against hand-computed expectations: known
  * merge sequence on a tiny corpus, the adjacent-repeated-pair case
  * the two-space encoding exists for, determinism, and Spark-column
  * vs driver-loop application parity on real documents.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainer learns the hand-computed merge sequence on a tiny corpus") {
    // corpus: "low low low lower lowest" — classic BPE toy example
    val df = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(df, "doc_id", "text", sampleN = 10, nMerges = 3)
    // pair counts round 1: (l,o)=5, (o,w)=5, (w,e)=2, ... -> tie on 5,
    // lexicographically smallest is "l o"; round 2 merges (lo,w)=5;
    // round 3: (low,e)=2 vs (e,r)=1 (e,s)=1 (s,t)=1 -> "low e"
    assert(merges == Seq("l o", "lo w", "low e"))
  }

  test("adjacent repeated pairs merge leftmost-first (the two-space encoding case)") {
    // word "ababab": after merging (a,b) the result must be ab ab ab —
    // a single-space replace() encoding would merge only every second
    // occurrence
    val out = Seq("ababab").toDF("w")
      .select(Bpe.symbolsCol(Bpe.applyMergesCol($"w", Seq("a b"))).as("s"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("ab", "ab", "ab"))
    // and chained: merging (ab,ab) afterwards pairs the first two
    val out2 = Seq("ababab").toDF("w")
      .select(Bpe.symbolsCol(Bpe.applyMergesCol($"w", Seq("a b", "ab ab"))).as("s"))
      .collect().head.getSeq[String](0)
    assert(out2 == Seq("abab", "ab"))
  }

  test("training is deterministic and counts match a driver-side re-application on real docs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val m1 = Bpe.trainMerges(docs, "doc_id", "text", sampleN = 64, nMerges = 8)
    val m2 = Bpe.trainMerges(docs, "doc_id", "text", sampleN = 64, nMerges = 8)
    assert(m1 == m2 && m1.size == 8 && m1.distinct.size == 8)
    // column-expression counts == an independent driver re-application
    val got = docs.limit(40)
      .select($"doc_id", Bpe.bpeTokenCount($"text", m1).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val texts = docs.limit(40).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tokenRx = "[a-z0-9]+".r
    texts.foreach { case (id, t) =>
      val expected = tokenRx.findAllIn(t.toLowerCase(java.util.Locale.ROOT))
        .map { w =>
          val padded = m1.foldLeft(w.flatMap(c => s" $c ").mkString) { (acc, p) =>
            acc.replace(Bpe.mergeFrom(p), Bpe.mergeTo(p))
          }
          padded.trim.split("  ").length
        }.sum
      assert(got(id) == expected, s"doc $id")
    }
    // subword counts compress: strictly fewer symbols than characters,
    // at least as many as words
    val sanity = docs.select(
      sum(Bpe.bpeTokenCount($"text", m1)).as("bpe"),
      sum(size(TextFunctions.tokens($"text"))).as("words"),
      sum(length(regexp_replace(lower($"text"), "[^a-z0-9]", ""))).as("chars"))
      .collect().head
    assert(sanity.getLong(1) < sanity.getLong(0) && sanity.getLong(0) < sanity.getLong(2))
  }

  test("encode: subword tokens exactly partition every word (lossless reassembly)") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.trainMerges(docs, "doc_id", "text", sampleN = 64, nMerges = 8)
    // per word: concatenating its subwords must rebuild the word, and
    // every subword must be non-empty
    val bad = docs.limit(40)
      .select(explode(TextFunctions.tokens($"text")).as("w"))
      .select($"w", Bpe.symbolsCol(Bpe.applyMergesCol($"w", merges)).as("tk"))
      .filter(concat_ws("", $"tk") =!= $"w" || exists($"tk", t => length(t) === 0))
      .count()
    assert(bad == 0L)
  }
}
