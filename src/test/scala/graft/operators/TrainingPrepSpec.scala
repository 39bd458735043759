package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TrainingPrep

/** Semantic checks for the training-prep operators (the oracle gate
  * certifies exact values; these pin the SEMANTICS so a refactor that
  * stays self-consistent with its oracle still can't change meaning).
  */
class TrainingPrepSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  test("dedup_lines drops the shared header and per-source footer lines") {
    val out = TrainingPrep.lineDedup(spark, Dir).cache()
    try {
      // Every doc loses at least header+footer: n_kept <= n_lines - 2.
      assert(out.filter(col("n_kept") > col("n_lines") - 2).count() == 0)
      // But body lines survive: docs with >2 lines keep something.
      assert(out.filter(col("n_lines") > 2 && col("n_kept") === 0).count() == 0)
      // Reassembled text is certified per-doc (not a constant).
      val hashes = out.select(countDistinct(col("kept_hash"))).head().getLong(0)
      assert(hashes > 1)
    } finally out.unpersist()
  }

  test("dedup_lines threshold: a line below maxOcc is never dropped") {
    // With maxOcc above the corpus size nothing can be dropped.
    val out = TrainingPrep.lineDedup(spark, Dir, maxOcc = 1000000)
    assert(out.filter(col("n_kept") =!= col("n_lines")).count() == 0)
  }

  test("dedup_substring coverage is a fraction of the doc's windows") {
    val out = TrainingPrep.dedupSubstring(spark, Dir).cache()
    try {
      assert(out.filter(col("coverage") < 0.0 || col("coverage") > 1.0).count() == 0)
      assert(out.filter(col("dups") > col("total")).count() == 0)
      assert(out.count() <= 50)
    } finally out.unpersist()
  }

  test("pipeline_pack chunks respect the token budget shape") {
    val out = TrainingPrep.packSequences(spark, Dir, seqLen = 256).cache()
    try {
      // Greedy concat-then-split: a chunk holds docs whose START offsets
      // share a 256-token window, so per-chunk tokens < 256 + the last
      // doc's length; with the corpus max doc ~120 tokens this bounds
      // n_tokens and every chunk except a bucket's last is >= seqLen - max.
      val stats = out.agg(max(col("n_tokens")), min(col("n_docs"))).head()
      assert(stats.getLong(0) < 256 + 200, s"chunk overflow: ${stats.getLong(0)}")
      assert(stats.getLong(1) >= 1)
      // Chunk ids are dense per bucket (greedy never skips a window
      // unless one doc spans it — doc < seqLen here, so dense).
      val buckets = out.groupBy(col("bucket"))
        .agg(countDistinct(col("chunk")).as("n"), max(col("chunk")).as("mx"))
      assert(buckets.filter(col("n") =!= col("mx") + 1).count() == 0)
    } finally out.unpersist()
  }

  test("pipeline_mix caps each source near the target, deterministically") {
    val a = TrainingPrep.mixSources(spark, Dir, target = 12.0)
    val b = TrainingPrep.mixSources(spark, Dir, target = 12.0)
    assert(a.collect().toSeq == b.collect().toSeq) // reproducible, no rand()
    val rows = a.collect()
    rows.foreach { r =>
      val (nDocs, nKept, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rate >= 0.0 && rate <= 1.0)
      assert(nKept <= nDocs)
      if (rate == 1.0) assert(nKept == nDocs) // undersized sources kept whole
    }
  }
}
