package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSimSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today")) // exact dup of 1
    .toDF("doc_id", "text")

  test("exactByHash groups identical payloads") {
    val out = Dedup.exactByHash(docs, $"text", $"doc_id")
      .orderBy("keep_id").collect()
    assert(out.length == 3)
    assert(out.head.getLong(1) == 1L && out.head.getLong(2) == 2L) // docs 1+4
  }

  test("minhash LSH finds the near-dup pair with high jaccard") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .filter($"jaccard" > 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard: exact dup = 1.0, near-dup high, disjoint absent") {
    val m = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(m((1L, 4L)) == 1.0)
    assert(m((1L, 2L)) > 0.7)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard never emits self-pairs for duplicated doc ids") {
    val dup = docs.unionAll(docs.filter($"doc_id" === 1L)) // id 1 twice
    val out = Dedup.ngramJaccardPairs(dup, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.forall { case (a, b) => a != b }, s"self-pair in ${out.toSeq}")
  }

  test("ngram jaccard emits one row per pair even when a duplicated id has divergent text") {
    val dup = docs.unionAll(Seq(
      (1L, "totally divergent text for the duplicated identifier case here now"))
      .toDF("doc_id", "text"))
    val out = Dedup.ngramJaccardPairs(dup, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.length == out.distinct.length,
      s"pair fragmented into multiple rows: ${out.toSeq.sorted}")
  }

  test("incremental dedup drops seen and in-batch duplicate content, keeps the rest") {
    // store populated with the pipeline's normalized fingerprints
    val seen = Seq("x").toDF("fp")
      .select(graft.functions.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.lit("Old news.")).as("fp"))
    val batch = Seq(
      (10L, "old NEWS"), // normalizes to the seen fingerprint -> dropped
      (11L, "fresh a"), (12L, "Fresh A!"), // in-batch near-identical -> first id wins
      (13L, "fresh b")).toDF("doc_id", "text")
    val out = Dedup.incremental(batch, "text", "doc_id", seen)
    assert(out.columns.contains("fingerprint")) // callers append these to the store
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(11L, 13L))
  }

  test("streaming dedup drops duplicate content within the watermark window") {
    // batch execution of the same plan (watermark is a no-op in batch,
    // dropDuplicates semantics identical)
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "same"),
      (2L, "2024-01-01 00:00:10", "same"),
      (3L, "2024-01-01 00:00:20", "other"))
      .toDF("id", "ts", "text")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp($"ts"))
    val out = Dedup.streamingDedup(df, "text", "ts", "10 minutes")
    assert(out.count() == 2)
    assert(out.select("text").as[String].collect().toSet == Set("same", "other"))
  }

  test("clusters: min-label propagation finds connected components") {
    // components: {1,2,4} via 1-2, 2-4; {7,9}; singletons don't appear
    val pairs = Seq((1L, 2L), (2L, 4L), (7L, 9L)).toDF("id_a", "id_b")
    val c = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("clusters: chain requiring multiple propagation rounds") {
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val c = Dedup.clusters(chain).as[(Long, Long)].collect()
    assert(c.forall(_._2 == 1L)) // the whole chain collapses to min id
  }

  test("end-to-end dedup: minhash pairs -> clusters -> representatives") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text").filter($"jaccard" > 0.5)
    val c = Dedup.clusters(pairs)
    val reps = c.filter($"id" === $"cluster").select("id").as[Long].collect().toSet
    // docs 1,2,4 form one near-dup cluster -> representative 1; doc 3 untouched
    assert(reps == Set(1L))
    assert(c.count() == 3)
  }

  test("simhash: identical text -> identical sig; near-dup -> small hamming") {
    val sigs = docs.select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .as[(Long, String)].collect().toMap
    assert(sigs(1L).length == 64 && sigs(1L).matches("[01]{64}"))
    assert(sigs(1L) == sigs(4L))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
  }

  test("cosine: self-similarity is 1.0, topk ranks by similarity") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val self = emb.select(Similarity.cosine($"embedding", $"embedding")).as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
    val top = Similarity.cosineTopK(emb, emb.filter($"vec_id" === 0), k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.toSeq == Seq(1L, 2L, 3L))
  }

  test("lsh bucket is deterministic and groups identical vectors") {
    val emb = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val buckets = emb.select(Similarity.lshBucket($"embedding", 8)).as[String].collect()
    assert(buckets(0) == buckets(1) && buckets(0).matches("[01]{8}"))
  }

  test("ivf: results are exact within probed lists and recall brute force well") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 8)
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, nCentroids = 8, nProbe = 3)
      .select($"qid", $"vec_id", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = Similarity.cosineTopK(emb, queries, k = 5)
      .select($"qid", $"vec_id", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // every IVF hit's score matches the brute-force score for that pair
    // exactly (IVF prunes candidates, never changes the metric)
    val bruteAll = Similarity.cosineTopK(emb, queries, k = Int.MaxValue)
      .select($"qid", $"vec_id", $"cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivf.foreach { case (q, v, c) => assert(bruteAll((q, v)) == c) }
    // recall@5 vs brute force over the 8 queries: probing 3 of 8 lists
    // must still find most true neighbors on this corpus (with the
    // salted-hash seed sample, nProbe=2 sits at 0.475 — deterministic,
    // but too close to the bar to pin)
    val bruteSet = brute.map(t => (t._1, t._2)).toSet
    val hit = ivf.count(t => bruteSet((t._1, t._2)))
    assert(hit.toDouble / brute.length >= 0.5,
      s"IVF recall@5 = ${hit.toDouble / brute.length}")
  }

  test("semanticDedup drops near-identical cluster-mates, keeps the lowest id") {
    // 0/1/4 colinear (pairwise cos = 1), 2 near-orthogonal, 3 opposite
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)),
      (4L, Array(3.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, tau = 0.99, nCentroids = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // 1 and 4 are dropped against keeper 0; 2 and 3 survive
    assert(out.toSeq.map(t => (t._1, t._2)) == Seq((1L, 0L), (4L, 0L)))
    assert(out.forall(t => math.abs(t._3 - 1.0) < 1e-12))
  }

  test("semanticDedup never pairs across clusters") {
    // two tight clusters; the salted-hash seed sample picks ids 0 and 3
    // (md5('seed:'||id) order over {0..3} is 0,3,2,1) — one per cluster
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.01f)), (3L, Array(0.01f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, tau = 0.9, nCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 2 dropped in cell cid=0 (keeper 0), 3 dropped in cell cid=3
    // (keeper 1); cross-cluster cos ~0 never considered even if tau were 0
    assert(out.toSet == Set((2L, 0L, 0L), (3L, 3L, 1L)))
  }

  test("ivfAssignLit (narrow literal map) equals ivfAssign (frame windows) on real vectors") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val seeds = Similarity.collectSeeds(emb, 8)
    val viaFrames = Similarity.ivfAssign(emb, Similarity.seedCentroids(emb, 8))
      .select("cid", "vec_id").collect()
      .map(r => (r.getLong(1), r.getLong(0))).toMap
    val viaLit = Similarity.ivfAssignLit(emb, seeds)
      .select("cid", "vec_id").collect()
      .map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(viaLit.size == viaFrames.size)
    assert(viaLit == viaFrames)
  }

  test("ivfAssignLit drops zero-norm vectors instead of letting NaN win the argmax") {
    // Spark NaN ordering (NaN sorts greatest) would otherwise assign a
    // zero-norm vector to the lowest-cid centroid with csim = NaN
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (7L, Array(0f, 0f))) // zero-norm: cosine NaN against everything
      .toDF("vec_id", "embedding")
    val seeds = Similarity.collectSeeds(vecs.filter($"vec_id" < 2), 2)
    val out = Similarity.ivfAssignLit(vecs, seeds)
      .select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L)) // 7 dropped, others exact
  }

  test("pqEncodeLit (narrow literal map) equals pqCodes (explode+window) on real vectors") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val m = 4
    val dim = 64
    val cb = Similarity.pqCodebook(emb, m, 8, dim)
    val viaFrames = Similarity.pqCodes(emb, cb, m, dim).collect()
      .map(r => (r.getLong(0),
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getInt(0), e.getLong(1))))).toMap
    val seeds = Similarity.collectSeeds(emb, 8)
      .map { case (cid, ce) => (cid, ce.map(_.toDouble)) }
    val viaLit = emb.select(col("vec_id"),
      Similarity.pqEncodeLit(col("embedding"), seeds, m, dim / m, "cid").as("codes"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getInt(0), e.getLong(1))))).toMap
    assert(viaLit.size == viaFrames.size)
    assert(viaLit == viaFrames)
  }

  /** Clustered fixture where the seed convention is WORST-case: the 4
    * vectors the salted-hash sample picks as untrained centroids
    * (md5('seed:'||id) order over 0..119 → ids 52, 89, 101, 111) all
    * sit in cluster 0 with only tiny jitter between them, so seeded
    * cells are noise-driven mixtures of all clusters. Training exists
    * to fix exactly this.
    */
  private def clusteredEmbeddings = {
    val degenerateSeeds = Set(52L, 89L, 101L, 111L)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      val cluster = if (degenerateSeeds(i.toLong)) 0 else i % 4
      val v = Array.fill(16)(rnd.nextGaussian().toFloat * 0.08f)
      v(cluster * 4) += 1f
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("trained IVF recall >= seeded recall on a clustered corpus (and beats it strictly here)") {
    val emb = clusteredEmbeddings.cache()
    val queries = emb.filter($"vec_id" >= 112) // 2 queries per cluster
    def recall(ann: org.apache.spark.sql.DataFrame): Double = {
      val truth = Similarity.cosineTopK(emb, queries, k = 5)
        .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = ann.select($"qid", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    val seeded = recall(Similarity.ivfTopK(emb, queries, k = 5,
      nCentroids = 4, nProbe = 1))
    val trained = recall(Similarity.ivfTopKTrained(emb, queries, k = 5,
      nCentroids = 4, nProbe = 1, sampleN = 120, iters = 5))
    assert(trained >= seeded, s"trained recall $trained < seeded $seeded")
    assert(trained > seeded,
      s"fixture must demonstrate a strict win (trained=$trained seeded=$seeded)")
    assert(trained >= 0.9, s"k-means should recover the 4 clean clusters, got $trained")
  }

  test("trained PQ recall >= seeded PQ recall on the same clustered corpus") {
    val emb = clusteredEmbeddings.cache()
    val queries = emb.filter($"vec_id" >= 112)
    val truth = Similarity.cosineTopK(emb, queries, k = 5)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = ann.select($"qid", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    // 4 codewords/subspace = the degenerate-seeds regime (all four
    // seed vectors sit in cluster 0): training must not LOSE recall
    // here, and the decisive training win is asserted on the coarse
    // quantizer (IVF test above) — per-subspace k-means improves PQ in
    // expectation, not pointwise, so this is a no-regression bound.
    val seeded = recall(Similarity.pqTopK(emb, queries, k = 5,
      m = 4, nCentroids = 4, knownDim = 16))
    val trained = recall(Similarity.pqTopKTrained(emb, queries, k = 5,
      m = 4, nCentroids = 4, sampleN = 120, iters = 5, knownDim = 16))
    assert(trained >= seeded, s"trained PQ recall $trained < seeded $seeded")
    // absolute bar is modest by design: truth is COSINE top-5 while ADC
    // approximates L2 on unnormalized vectors, so even a perfect
    // codebook caps well under 1.0 here — the decisive absolute claim
    // (>= 0.9) is made on the trained coarse quantizer above
    assert(trained >= 0.2, s"trained PQ should beat noise on clean clusters, got $trained")
  }

  test("trained centroids differ from the seeds and training is deterministic") {
    val emb = clusteredEmbeddings
    val sample = Similarity.collectSeeds(emb, 120)
    // lloyd's initial centroids are the k lowest IDS of the sample
    // (the sample itself is salted-hash selected)
    val seeds = sample.sortBy(_._1).take(4)
      .map { case (id, v) => (id, v.map(_.toDouble).toSeq) }
    val t1 = Similarity.kmeansCosine(sample, 4, 3).map { case (id, v) => (id, v.toSeq) }
    val t2 = Similarity.kmeansCosine(sample, 4, 3).map { case (id, v) => (id, v.toSeq) }
    assert(t1 == t2, "same sample + iters must give bit-identical codebooks")
    assert(t1.map(_._1) == seeds.map(_._1), "cluster ids stay the seed vec_ids")
    assert(t1 != seeds, "one Lloyd round must move the centroids")
  }

  test("property: prefix-filter jaccard join equals the naive all-pairs join") {
    // random word-soup corpora: the prefix index must lose NOTHING at
    // the threshold, for every τ in {0.5, 0.7, 0.9}
    val rnd = new scala.util.Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj")
    (0 until 3).foreach { trial =>
      val corpus = (0 until 40).map { i =>
        val base = (0 until 8 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size)))
        (i.toLong, base.mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      def shingleSet(t: String): Set[String] = {
        val w = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector
        w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      }
      Seq(5, 7, 9).foreach { tau =>
        val got = Dedup.jaccardJoinPrefix(df, "doc_id", "text", tau)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        val expected = (for {
          (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
          sa = shingleSet(ta); sb = shingleSet(tb)
          if sa.nonEmpty && sb.nonEmpty
          inter = (sa & sb).size
          j = inter.toDouble / (sa.size + sb.size - inter)
          if j >= tau / 10.0
        } yield (ia, ib)).toSet
        assert(got == expected, s"trial=$trial tau=0.$tau " +
          s"missing=${expected -- got} extra=${got -- expected}")
      }
    }
  }
}
