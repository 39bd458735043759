package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer TRAINED on a bounded corpus
  * sample (round 4) — the trained-quantizer pattern applied to
  * tokenization: a driver-side training loop whose every step is
  * deterministic and oracle-expressible, producing a literal merge
  * table the distributed plan folds over. Real subword token counts
  * (the quantity data mixing/packing budgets actually need) instead
  * of the whitespace approximation, with NO tokenizer library.
  *
  * Algorithm (Sennrich, Haddow, Birch 2016, arXiv:1508.07909): words
  * are character sequences; each round counts adjacent symbol pairs
  * weighted by word frequency, merges the most frequent pair — ties
  * to the LEXICOGRAPHICALLY SMALLEST pair, so training is
  * deterministic — and rewrites the vocabulary by leftmost
  * non-overlapping replacement. Application replays the merges in
  * training order — the original paper's encoder.
  *
  * Representation trick that makes plain `replace()` a CORRECT BPE
  * step in both engines: symbols are separated by TWO spaces with one
  * space of end padding (` h  e  l  l  o `), i.e. every symbol owns
  * exactly one space on each side. The pattern ` x  y ` consumes only
  * the owned spaces of x and y, so adjacent repeated pairs still
  * merge leftmost-first (a single-space encoding would swallow the
  * shared separator and skip every second occurrence). `replace` has
  * identical scan-after-replacement semantics in Java, Spark and
  * DuckDB — which is what makes the whole pipeline hash-certifiable.
  *
  * Scale shape: training touches only the `sampleN` lowest-id docs
  * (one bounded driver job); application is a narrow per-row fold of
  * ≤ nMerges literal replacements — no shuffle, no state.
  */
object Bpe {

  /** `hello` → ` h  e  l  l  o ` (each char becomes ` c `). */
  private def spacedScala(w: String): String =
    w.flatMap(c => s" $c ")

  private def symbols(padded: String): Array[String] =
    padded.trim.split("  ")

  /** Padded search/replacement strings for a merge pair `"x y"`. */
  private[functions] def mergeFrom(pair: String): String = {
    val Array(x, y) = pair.split(' ')
    s" $x  $y "
  }

  private[functions] def mergeTo(pair: String): String =
    " " + pair.replace(" ", "") + " "

  /** One training round over (paddedWord -> freq). */
  private def bestPair(vocab: Seq[(String, Long)]): Option[String] = {
    val counts = scala.collection.mutable.Map[String, Long]()
    vocab.foreach { case (w, f) =>
      val syms = symbols(w)
      var i = 0
      while (i < syms.length - 1) {
        val p = syms(i) + " " + syms(i + 1)
        counts(p) = counts.getOrElse(p, 0L) + f
        i += 1
      }
    }
    if (counts.isEmpty) None
    // max count, ties to the byte-smallest pair (ASCII symbols, so
    // String ordering == DuckDB byte ordering)
    else Some(counts.toSeq.minBy { case (p, c) => (-c, p) }._1)
  }

  /** Driver-side trainer on a `sampleN`-doc deterministic sample — the
    * k lowest salted-hash priorities (`md5('bpe:'||doc_id)`, ties by
    * id), uniform over the corpus and SQL-replayable, where "lowest
    * ids" would train on ingest-order-correlated text. Word model
    * is [[TextFunctions.tokens]] exactly: `[a-z0-9]+` over the
    * Locale.ROOT-lowercased text; null texts contribute nothing.
    * Returns merges ("x y") in training order — FEWER than `nMerges`
    * when the sample exhausts its pairs (empty/degenerate corpora must
    * not crash a query registry sweep). The oracle unrolls all
    * `nMerges` rounds, so hash certification assumes a corpus rich
    * enough to support them — true of the driver corpora by a wide
    * margin; a sub-`nMerges` corpus is outside the certified contract.
    */
  def trainMerges(docs: DataFrame, idCol: String, textCol: String,
                  sampleN: Int, nMerges: Int): Seq[String] = {
    val sample = docs
      .orderBy(md5(concat(lit("bpe:"), col(idCol).cast("string"))), col(idCol))
      .limit(sampleN)
      .select(col(textCol)).collect().map(r => if (r.isNullAt(0)) "" else r.getString(0))
    val tokenRx = "[a-z0-9]+".r
    val freq = scala.collection.mutable.Map[String, Long]()
    sample.foreach { t =>
      tokenRx.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).foreach { w =>
        freq(w) = freq.getOrElse(w, 0L) + 1L
      }
    }
    var vocab: Seq[(String, Long)] =
      freq.toSeq.sortBy(_._1).map { case (w, f) => (spacedScala(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer[String]()
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      bestPair(vocab) match {
        case Some(p) =>
          merges += p
          vocab = vocab.map { case (w, f) => (w.replace(mergeFrom(p), mergeTo(p)), f) }
          r += 1
        case None => done = true
      }
    }
    merges.toSeq
  }

  /** ` h  e  l  l  o ` as a column (the regexp spelled identically in
    * the oracle: every char → ` c `, global).
    */
  private def spaced(w: Column): Column =
    regexp_replace(w, "(.)", " $1 ")

  /** Apply trained merges to one word column: the replace() fold. */
  def applyMergesCol(w: Column, merges: Seq[String]): Column =
    merges.foldLeft(spaced(w)) { (acc, p) =>
      call_function("replace", acc, lit(mergeFrom(p)), lit(mergeTo(p)))
    }

  /** Symbols of an applied word (padded form → array). */
  def symbolsCol(applied: Column): Column = split(trim(applied), "  ")

  /** Per-document subword token count under the trained merges: every
    * word's symbol count after the fold, summed. Narrow map.
    */
  def bpeTokenCount(text: Column, merges: Seq[String]): Column =
    aggregate(
      transform(TextFunctions.tokens(text),
        w => size(symbolsCol(applyMergesCol(w, merges)))),
      lit(0), (acc, n) => acc + n)
}
