package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent plain-Scala references for the round-3 filter/PQ wave:
  * filter_gopher (full Gopher rule panel), filter_url (UT1-style
  * suffix blocklist), and sim_pq (product-quantization ADC). Each
  * reference recomputes the operator from collected rows with the
  * same sequential IEEE fold orders, so double comparisons are exact.
  */
class CurationFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("filterGopher matches a plain-Scala rule-panel reference, doubles exact") {
    val stop = graft.functions.TextFunctions.Stopwords
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = docs.map { case (id, raw) =>
      val t = raw +
        (if (id % 7 == 0) "\n- bullet item\n- second item" else "") +
        (if (id % 11 == 0) "\nto be continued...\nmore #tags #here..." else "")
      val words = t.split("[\t\n\f\r ]+").filter(_.nonEmpty)
      val n = words.length
      val sumLen = words.foldLeft(0L)((a, w) => a + w.length)
      val meanLen = if (n > 0) Some(sumLen.toDouble / n.toDouble) else None
      val nHash = t.count(_ == '#')
      val nEll = (t.length - t.replace("...", "").length) / 3
      val lines = t.split("\n").map(_.trim).filter(_.nonEmpty)
      val nLines = lines.length
      val nBullet = lines.count(l => l.startsWith("-") || l.startsWith("*"))
      val nEllEnd = lines.count(_.endsWith("..."))
      val isAscii = (c: Char) => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      val nAlpha = words.count(_.exists(isAscii))
      val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSet
      val nStop = stop.count(toks.contains)
      def ratio(num: Int, den: Int) = if (den > 0) Some(num.toDouble / den.toDouble) else None
      val symbolRatio = ratio(nHash + nEll, n)
      val bulletFrac = ratio(nBullet, nLines)
      val ellFrac = ratio(nEllEnd, nLines)
      val alphaFrac = ratio(nAlpha, n)
      val keep = n >= 50 && n <= 100000 &&
        meanLen.exists(m => m >= 3.0 && m <= 10.0) &&
        symbolRatio.exists(_ <= 0.1) && bulletFrac.exists(_ <= 0.9) &&
        ellFrac.exists(_ <= 0.3) && alphaFrac.exists(_ >= 0.8) && nStop >= 2
      id -> ((n, meanLen, symbolRatio, bulletFrac, ellFrac, alphaFrac, nStop, keep))
    }
    val got = CurationQueries.filterGopher(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val id = r.getLong(0)
      def optD(i: Int): Option[Double] = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      val actual = (r.getInt(1), optD(2), optD(3), optD(4), optD(5), optD(6),
        r.getInt(7), r.getBoolean(8))
      assert(actual == expected(id), s"doc $id")
    }
    // the panel discriminates: both keep values occur on this corpus
    val keeps = got.map(_.getBoolean(8)).toSet
    assert(keeps == Set(true, false))
  }

  test("filterUrl: registered-domain entry blocks the whole source, host entry 1/3") {
    val srcCounts = graft.Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    val expected = srcCounts.map { case (src, xs) =>
      val blocked =
        if (src == "src3") xs.size
        else if (src == "src7") xs.count(_._2 % 3 == 1)
        else 0
      src -> ((blocked.toLong, (xs.size - blocked).toLong))
    }
    val got = CurationQueries.filterUrl(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got("src3")._1 > 0 && got("src7")._1 > 0 && got("src0")._1 == 0)
  }

  test("pqTopK matches a plain-Scala ADC reference, distances bit-exact") {
    val m = 4
    val k = 8
    val embs = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = embs.head._2.length
    val sub = dim / m
    def sqL2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble
        acc = acc + d * d
        i += 1
      }
      acc
    }
    val seeds = embs.sortBy(_._1).take(k)
    // codebook: (m, cid) -> centroid subvector
    val cb = (for {
      (cid, ce) <- seeds
      mi <- 0 until m
    } yield ((mi, cid), ce.slice(mi * sub, mi * sub + sub))).toMap
    val cids = seeds.map(_._1)
    // codes: per vector, argmin-(d, cid) centroid per subspace
    val codes = embs.map { case (id, e) =>
      id -> (0 until m).map { mi =>
        val s = e.slice(mi * sub, mi * sub + sub)
        cids.map(c => (sqL2(s, cb((mi, c))), c)).min._2
      }
    }.toMap
    val queries = embs.filter(_._1 < 8)
    val expected = queries.flatMap { case (qid, qe) =>
      val qsubs = (0 until m).map(mi => qe.slice(mi * sub, mi * sub + sub))
      val scored = embs.filter(_._1 != qid).map { case (vid, _) =>
        // fold in ascending m — the operator's codes-array order
        val adist = (0 until m).foldLeft(0.0)((acc, mi) =>
          acc + sqL2(qsubs(mi), cb((mi, codes(vid)(mi)))))
        (vid, adist)
      }
      scored.sortBy { case (vid, d) => (d, vid) }.take(5).zipWithIndex
        .map { case ((vid, d), i) => (qid, vid, d, i + 1) }
    }.toSeq
    val got = graft.operators.Similarity.pqTopK(
      graft.Tables(spark, dir, "embeddings"),
      graft.Tables(spark, dir, "embeddings").filter(col("vec_id") < 8),
      k = 5, m = m, nCentroids = k)
      .orderBy(col("qid"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected) // includes bit-equality of adist doubles
  }

  test("pqCodes: every code is the argmin-L2 sub-centroid and codes stay in-range") {
    val emb = graft.Tables(spark, dir, "embeddings")
    val cb = graft.operators.Similarity.pqCodebook(emb, m = 4, k = 8, dim = 64)
    val codes = graft.operators.Similarity.pqCodes(emb, cb, m = 4, dim = 64).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val entries = r.getSeq[org.apache.spark.sql.Row](1)
      assert(entries.map(_.getInt(0)) == Seq(0, 1, 2, 3)) // one code per subspace, m-sorted
      assert(entries.forall(e => e.getLong(1) >= 0 && e.getLong(1) < 8)) // seed cids
    }
  }
}
