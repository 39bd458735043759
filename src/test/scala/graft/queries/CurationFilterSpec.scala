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
    // the operator's salted-hash sample convention (collectSeeds)
    def pri(salt: String, id: Long): (String, Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + id).getBytes("UTF-8"))
      (d.map("%02x".format(_)).mkString, id)
    }
    val seeds = embs.sortBy(e => pri("seed:", e._1)).take(k)
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

  test("filterC4 matches a plain-Scala rule-panel reference and every rule fires") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = docs.map { case (id, raw) =>
      val t = raw +
        (if (id % 4 == 0) "\nShort line" else "") +
        (if (id % 5 == 0) "\nThis appended sentence clearly contains more than five words." +
          "\nAnother appended sentence also contains well over five words." +
          "\nA third full sentence closes out this appended paragraph nicely." else "") +
        (if (id % 9 == 0) "\nEnable javascript to view this page." else "") +
        (if (id % 13 == 0) "\nlorem ipsum dolor sit amet." else "") +
        (if (id % 17 == 0) "\nfunction f() { return 1; }" else "") +
        (if (id % 19 == 0) "\nThis line mentions badword1 today." else "")
      val lines = t.split("\n").map(_.trim).filter(_.nonEmpty)
      val nKept = lines.count { l =>
        (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
          l.split("[\t\n\f\r ]+").count(_.nonEmpty) >= 5 &&
          !l.toLowerCase.contains("javascript")
      }
      val nSent = t.count(c => c == '.' || c == '!' || c == '?')
      val hasLorem = t.toLowerCase.contains("lorem ipsum")
      val hasBrace = t.contains("{")
      val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSet
      val hasBad = toks.contains("badword1") || toks.contains("badword2")
      val keep = nSent >= 3 && !hasLorem && !hasBrace && !hasBad && nKept >= 1
      id -> ((lines.length, nKept, nSent, hasLorem, hasBrace, hasBad, keep))
    }
    val got = CurationQueries.filterC4(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val actual = (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))
      assert(actual == expected(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    // panel discriminates: each page-level flag fires somewhere, and the
    // line rules actually drop lines (n_kept < n_lines somewhere)
    assert(got.exists(_.getBoolean(4)) && got.exists(_.getBoolean(5)) &&
      got.exists(_.getBoolean(6)))
    assert(got.map(_.getBoolean(7)).toSet == Set(true, false))
    assert(got.exists(r => r.getInt(2) < r.getInt(1)))
  }

  test("textReadability matches a plain-Scala Flesch reference, scores bit-exact") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = docs.map { case (id, t) =>
      val words = t.split("[\t\n\f\r ]+").filter(_.nonEmpty)
      val nW = words.length
      val nS = math.max(t.count(c => c == '.' || c == '!' || c == '?'), 1)
      val nSyl = words.foldLeft(0L)((a, w) =>
        a + math.max("[aeiouy]+".r.findAllIn(w.toLowerCase).length, 1))
      // (the operator computes this as whole-text vowel-run counting +
      // a no-vowel-word floor — algebraically identical to the per-word
      // max(runs, 1) sum this reference uses)
      val (ease, grade) =
        if (nW > 0) {
          val wps = nW.toDouble / nS.toDouble
          val spw = nSyl.toDouble / nW.toDouble
          (Some(206.835 - 1.015 * wps - 84.6 * spw), Some(0.39 * wps + 11.8 * spw - 15.59))
        } else (None, None)
      val band = ease.map(e =>
        if (e >= 90.0) "very_easy" else if (e >= 60.0) "standard"
        else if (e >= 30.0) "difficult" else "very_confusing")
      id -> ((nW, nS, nSyl, ease, grade, band))
    }
    val got = CurationQueries.textReadability(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      val actual = (r.getInt(1), r.getInt(2), r.getLong(3), optD(4), optD(5),
        Option(r.getString(6)))
      assert(actual == expected(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    // the panel discriminates: at least two bands occur on this corpus
    assert(got.map(_.getString(6)).distinct.length >= 2)
  }

  test("filterClassifier matches a plain-Scala hashed-linear reference, scores bit-exact") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val w = (0 until 64).map(j =>
      "0123456789abcdef".indexOf(md5hex("w:" + j).charAt(0)) / 7.5 - 1.0).toArray
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = docs.map { case (id, t) =>
      val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      val z = toks.foldLeft(0.0)((acc, tk) =>
        acc + w((java.lang.Long.parseLong(md5hex(tk).take(8), 16) % 64).toInt))
      val score = if (toks.nonEmpty) Some(z / toks.size.toDouble) else None
      id -> ((toks.size, score, score.exists(_ >= 0)))
    }
    val got = CurationQueries.filterClassifier(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val score = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert((r.getInt(1), score, r.getBoolean(3)) == expected(r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
    // the gate discriminates on this corpus
    assert(got.map(_.getBoolean(3)).toSet == Set(true, false))
  }

  test("ivfpqTopK matches a plain-Scala IVFADC reference, distances bit-exact") {
    val m = 4
    val nCells = 8
    val pqK = 8
    val nProbe = 2
    val embs = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = embs.head._2.length
    val sub = dim / m
    def dotf(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc = acc + a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dotf(a, b) / (math.sqrt(dotf(a, a)) * math.sqrt(dotf(b, b)))
    def sqL2d(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc = acc + d * d; i += 1 }
      acc
    }
    // the operator's salted-hash sample convention (collectSeeds)
    def pri(salt: String, id: Long): (String, Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + id).getBytes("UTF-8"))
      (d.map("%02x".format(_)).mkString, id)
    }
    val cents = embs.sortBy(e => pri("seed:", e._1)).take(nCells)
    def assignCell(e: Array[Float]): Long =
      cents.map { case (cid, ce) => (cos(e, ce), cid) }
        .sortBy { case (c, cid) => (-c, cid) }.head._2
    val resid = embs.map { case (id, e) =>
      val ce = cents.find(_._1 == assignCell(e)).get._2
      id -> (assignCell(e), e.indices.map(i => e(i).toDouble - ce(i).toDouble).toArray)
    }.toMap
    val cb = (for {
      (pcid, (_, r)) <- resid.toSeq.sortBy(e => pri("pqseed:", e._1)).take(pqK)
      mi <- 0 until m
    } yield ((mi, pcid), r.slice(mi * sub, mi * sub + sub))).toMap
    val pcids = resid.toSeq.sortBy(e => pri("pqseed:", e._1)).take(pqK).map(_._1)
    val codes = resid.map { case (id, (_, r)) =>
      id -> (0 until m).map { mi =>
        val s = r.slice(mi * sub, mi * sub + sub)
        pcids.map(c => (sqL2d(s, cb((mi, c))), c)).min._2
      }
    }
    val expected = embs.filter(_._1 < 8).flatMap { case (qid, qe) =>
      val probed = cents.map { case (cid, ce) => (cos(qe, ce), cid, ce) }
        .sortBy { case (c, cid, _) => (-c, cid) }.take(nProbe)
      val scored = probed.flatMap { case (_, cid, ce) =>
        val qresid = qe.indices.map(i => qe(i).toDouble - ce(i).toDouble).toArray
        val dtab = (for {
          mi <- 0 until m; c <- pcids
        } yield ((mi, c), sqL2d(qresid.slice(mi * sub, mi * sub + sub), cb((mi, c))))).toMap
        resid.toSeq.filter { case (vid, (vcid, _)) => vcid == cid && vid != qid }
          .map { case (vid, _) =>
            val adist = (0 until m).foldLeft(0.0)((acc, mi) =>
              acc + dtab((mi, codes(vid)(mi))))
            (vid, adist)
          }
      }
      scored.sortBy { case (vid, d) => (d, vid) }.take(5).zipWithIndex
        .map { case ((vid, d), i) => (qid, vid, d, i + 1) }
    }.toSeq
    val got = graft.operators.Similarity.ivfpqTopK(
      graft.Tables(spark, dir, "embeddings"),
      graft.Tables(spark, dir, "embeddings").filter(col("vec_id") < 8),
      k = 5, m = m, nCells = nCells, pqK = pqK, nProbe = nProbe)
      .orderBy(col("qid"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected) // includes bit-equality of adist doubles
  }

  test("pipelineFunnel: cross-checks filter_c4 keeps, invariants hold, gates discriminate") {
    val funnel = CurationQueries.pipelineFunnel(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // per-source totals must sum to the corpus
    assert(funnel.values.map(_._1).sum ==
      graft.Tables(spark, dir, "documents").count())
    // n_keep_c4 per source must equal the certified filter_c4 keeps
    val srcOf = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val c4Keeps = CurationQueries.filterC4(spark, dir)
      .select(col("doc_id"), col("keep")).collect()
      .filter(_.getBoolean(1)).map(r => srcOf(r.getLong(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // gopher + classifier keeps recomputed independently (plain Scala)
    // over the SAME enrichment — a drifted copy of either rule body in
    // the funnel would break these counts
    def enrich(id: Long, raw: String): String = raw +
      (if (id % 4 == 0) "\nShort line" else "") +
      (if (id % 5 == 0) "\nThis appended sentence clearly contains more than five words." +
        "\nAnother appended sentence also contains well over five words." +
        "\nA third full sentence closes out this appended paragraph nicely." else "") +
      (if (id % 9 == 0) "\nEnable javascript to view this page." else "") +
      (if (id % 13 == 0) "\nlorem ipsum dolor sit amet." else "") +
      (if (id % 17 == 0) "\nfunction f() { return 1; }" else "") +
      (if (id % 19 == 0) "\nThis line mentions badword1 today." else "")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wTab = (0 until 64).map(j =>
      "0123456789abcdef".indexOf(md5hex("w:" + j).charAt(0)) / 7.5 - 1.0).toArray
    val stop = graft.functions.TextFunctions.Stopwords
    val docRows = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expGopher = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val expCls = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docRows.foreach { case (id, src, raw) =>
      val t = enrich(id, raw)
      val words = t.split("[\t\n\f\r ]+").filter(_.nonEmpty)
      val n = words.length
      val lines = t.split("\n").map(_.trim).filter(_.nonEmpty)
      val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      val meanLen = if (n > 0) words.map(_.length.toLong).sum.toDouble / n else -1
      val nHash = t.count(_ == '#')
      val nEll = (t.length - t.replace("...", "").length) / 3
      val symbolRatio = if (n > 0) (nHash + nEll).toDouble / n else 2
      val bulletFrac = if (lines.nonEmpty)
        lines.count(l => l.startsWith("-") || l.startsWith("*")).toDouble / lines.length else 2
      val ellFrac = if (lines.nonEmpty)
        lines.count(_.endsWith("...")).toDouble / lines.length else 2
      val alphaFrac = if (n > 0)
        words.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toDouble / n
        else -1
      val nStop = stop.count(toks.toSet.contains)
      if (n >= 50 && n <= 100000 && meanLen >= 3.0 && meanLen <= 10.0 &&
        symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellFrac <= 0.3 &&
        alphaFrac >= 0.8 && nStop >= 2) expGopher(src) += 1
      val z = toks.foldLeft(0.0)((acc, tk) =>
        acc + wTab((java.lang.Long.parseLong(md5hex(tk).take(8), 16) % 64).toInt))
      if (toks.nonEmpty && z / toks.size >= 0) expCls(src) += 1
    }
    funnel.foreach { case (src, f) =>
      assert(f._3 == expGopher(src), s"n_keep_gopher for $src")
      assert(f._4 == c4Keeps.getOrElse(src, 0L), s"n_keep_c4 for $src")
      assert(f._5 == expCls(src), s"n_keep_classifier for $src")
      // invariants: intersection bounded by each gate; uniques bounded
      assert(f._6 <= math.min(f._3, math.min(f._4, f._5)))
      assert(f._7 <= f._6 && f._7 <= f._2 && f._2 <= f._1)
    }
    // every gate discriminates somewhere on this corpus
    assert(funnel.values.exists(f => f._3 > 0 && f._3 < f._1)) // gopher
    assert(funnel.values.exists(f => f._4 > 0 && f._4 < f._1)) // c4
    assert(funnel.values.exists(f => f._5 > 0 && f._5 < f._1)) // classifier
  }

  test("pqCodes: every code is the argmin-L2 sub-centroid and codes stay in-range") {
    val emb = graft.Tables(spark, dir, "embeddings")
    val cb = graft.operators.Similarity.pqCodebook(emb, m = 4, k = 8, dim = 64)
    // cids are the hash-sampled seed vec_ids, not 0..k-1
    val seedIds = cb.select("cid").distinct().collect().map(_.getLong(0)).toSet
    assert(seedIds.size == 8)
    val codes = graft.operators.Similarity.pqCodes(emb, cb, m = 4, dim = 64).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val entries = r.getSeq[org.apache.spark.sql.Row](1)
      assert(entries.map(_.getInt(0)) == Seq(0, 1, 2, 3)) // one code per subspace, m-sorted
      assert(entries.forall(e => seedIds.contains(e.getLong(1)))) // seed cids
    }
  }
}
