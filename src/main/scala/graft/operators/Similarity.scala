package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (builder brief): brute-force
  * cosine top-k baseline + random-hyperplane LSH bucketing as the scale
  * path (the IVF-style variant: only same-bucket candidates are scored).
  *
  * Numeric discipline: dot products and norms are summed as decimals
  * (exact, order-independent) and reduced to double once — identical in
  * Spark and the DuckDB oracle, so cosine scores hash-match. All vector
  * math is per-row array expressions (zip_with/aggregate) — narrow,
  * codegen'd, no shuffle except the final top-k window on the (small)
  * query side.
  */
object Similarity {

  // Determinism note: dot products fold left-to-right in IEEE doubles.
  // Spark's `aggregate` over an array and DuckDB's `list_reduce` use the
  // same sequential order, so the result is bit-identical across engines
  // (decimal casting is NOT portable: Spark rounds the double's
  // shortest-repr digits, DuckDB the exact binary value).

  /** Sequential-fold dot product of two float-array columns (double).
    * Native codegen'd expression; [[dotHof]] is the interpreted
    * reference formulation (parity spec asserts bit-equality).
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.NativeExpressions.dotF(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm, same sequential fold. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity as a deterministic double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Brute-force cosine top-k: for each query vector (small side,
    * broadcast), score every corpus vector and keep k per query.
    * At scale: corpus stays partitioned, queries broadcast, the only
    * shuffle is the top-k window on (query, score) — and that can be
    * replaced by a per-partition top-k + merge when k is small.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")))
    val scored = corpus
      .select(col("vec_id"), col("embedding"))
      .crossJoin(q)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Radius (range) similarity search: ALL corpus vectors with cosine
    * ≥ τ of each query — the retrieval mode top-k can't express (a
    * fixed quality bar, unknown result count). Same scale shape as
    * [[cosineTopK]] minus the window: corpus stays partitioned,
    * queries broadcast, and the τ filter runs inside the scan
    * projection — NO shuffle at all in the whole plan.
    */
  def cosineRange(corpus: DataFrame, queries: DataFrame, tau: Double): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")))
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(q)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
      .filter(col("cos") >= tau)
      .select(col("qid"), col("vec_id"), col("cos"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — the diversified-retrieval step a RAG pipeline runs on the
    * ANN candidates: greedily pick `nSel` of the top-`kCand`, scoring
    * each remaining candidate λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s).
    * Every selection step is a keyed aggregate + top-1 window over the
    * CANDIDATE set (bounded: queries × kCand rows, checkpointed once),
    * so the loop cost is independent of corpus size — the corpus is
    * touched only by the initial top-k. λ and 1−λ are passed as TWO
    * literals (computing 1−0.7 at plan build would give
    * 0.30000000000000004 and break oracle parity).
    */
  def mmrSelect(corpus: DataFrame, queries: DataFrame, kCand: Int, nSel: Int,
                lam: Double, oneMinusLam: Double): DataFrame = {
    // Both weights are caller-written literals (so 1−λ stays a source
    // literal for oracle parity); exact double equality is therefore
    // the right consistency check — an inconsistent pair would silently
    // compute a non-MMR score.
    require(lam + oneMinusLam == 1.0,
      s"lam ($lam) + oneMinusLam ($oneMinusLam) must equal 1.0 exactly")
    val cands = cosineTopK(corpus, queries, kCand)
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("qid"), col("vec_id"), col("cos"), col("embedding"))
      .localCheckpoint(true)
    val pw = cands.as("x").join(cands.as("y"),
        col("x.qid") === col("y.qid") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.qid").as("qid"), col("x.vec_id").as("a"),
        col("y.vec_id").as("b"), cosine(col("x.embedding"), col("y.embedding")).as("cab"))
      .localCheckpoint(true)
    val wSel = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    var out = cands
      .withColumn("score", lit(lam) * col("cos"))
      .withColumn("rn", row_number().over(wSel)).filter(col("rn") === 1)
      .select(col("qid"), lit(1).as("sel_rank"), col("vec_id"), col("score"))
    (2 to nSel).foreach { step =>
      val pen = pw.join(out.select(col("qid"), col("vec_id").as("b")), Seq("qid", "b"))
        .groupBy(col("qid"), col("a").as("vec_id"))
        .agg(max(col("cab")).as("pen"))
      val si = cands
        .join(out.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"), "left_anti")
        .join(pen, Seq("qid", "vec_id"))
        .withColumn("score", lit(lam) * col("cos") - lit(oneMinusLam) * col("pen"))
        .withColumn("rn", row_number().over(wSel)).filter(col("rn") === 1)
        .select(col("qid"), lit(step).as("sel_rank"), col("vec_id"), col("score"))
      out = out.union(si)
    }
    val res = out.orderBy(col("qid"), col("sel_rank")).localCheckpoint(true)
    graft.Caches.free(cands)
    graft.Caches.free(pw)
    res
  }

  /** Deterministic pseudo-random hyperplane component r[j][d] in [-1,1],
    * derived from md5 — reproducible in any engine, no RNG state.
    */
  def planeComponent(j: Int, d: Column): Column = {
    val hv = call_function("instr", lit("0123456789abcdef"),
      md5(concat(lit(s"$j:"), d.cast("string"))).substr(1, 1)) - 1
    hv.cast("double") / lit(7.5) - lit(1.0)
  }

  /** Driver-side mirror of [[planeComponent]]: first md5 hex digit of
    * "j:d" mapped to [-1,1]. Identical doubles (integer digit / 7.5 - 1
    * in both), so plans built from these literals stay bit-parity with
    * the DuckDB oracle's md5 formulation.
    */
  def planeComponentValue(j: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((h(0) >> 4) & 0xf) / 7.5 - 1.0
  }

  /** Sign-random-projection bucket: `nPlanes`-char bit string per vector.
    * Per-row expression; bucketing the corpus equals an IVF coarse
    * quantizer with deterministic centroids. Plane components are
    * precomputed driver-side and folded in as literal arrays — the md5
    * that derives them is constant per (plane, dim) and has no business
    * running per row per element (measured: the md5-in-lambda version
    * dominated dedup_embedding's runtime). `dim` must equal the
    * embedding dimension (testdata: 64).
    */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int = 64): Column = {
    val bits = (0 until nPlanes).map { j =>
      val plane = array((0 until dim).map(d => lit(planeComponentValue(j, d))): _*)
      // truncate BOTH sides to the common length: zip_with pads the
      // shorter array with nulls, and one null element null-poisons the
      // whole fold — a dim mismatch would silently collapse every
      // vector into one bucket instead of erroring or degrading softly
      val n = least(size(vec), lit(dim))
      val dp = aggregate(
        zip_with(slice(vec, lit(1), n), slice(plane, lit(1), n),
          (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      when(dp > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Embedding near-dup candidate pairs via banded sign-random-projection
    * LSH: a `nPlanes`-bit signature split into `bands` bands; two vectors
    * are candidates when ANY band matches (OR-of-bands — recall grows
    * with bands, candidate volume per band shrinks with bits-per-band).
    * Pairs are deduplicated on ids BEFORE the embedding arrays join
    * back, so the band join never shuffles payload vectors and each
    * unique pair is scored exactly once.
    *
    * Sizing at scale: expected bucket population is N / 2^(planes/bands),
    * and within-bucket pairing is quadratic in that — so planes/bands
    * must grow as log2(N/targetBucket). E.g. N=1e9 vectors with ~1e4 per
    * bucket needs ~17 bits per band; the defaults (8 planes, 2 bands →
    * 4-bit bands) fit the sf test corpora. Both knobs are parameters —
    * callers at larger N raise planes (and bands for recall).
    */
  /** Actual embedding dimensionality, probed from one row (a single
    * cheap driver job at operator-build time). lshBucket's hyperplanes
    * are plan-time literals, so the dimension must be known up front —
    * defaulting it blind would silently truncate longer embeddings to
    * the literal length (removed signal, oracle divergence).
    */
  def probeDim(corpus: DataFrame): Int =
    corpus.select(size(col("embedding"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(64)
    // empty corpus → any dim works (every downstream frame is empty);
    // 64 matches the testdata embedding width

  /** @param knownDim embedding dimensionality when the caller already
    *   knows it (skips the probe job); <= 0 → probe one row.
    */
  def lshNearDupPairs(corpus: DataFrame, nPlanes: Int, bands: Int,
                      knownDim: Int = -1): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes=$nPlanes not divisible by bands=$bands")
    val bitsPerBand = nPlanes / bands
    val dim = if (knownDim > 0) knownDim else probeDim(corpus)
    // cache: sig feeds the banded self-join (both branches) AND the two
    // embedding join-backs — four otherwise-recomputed projections
    val sig = corpus.select(
      col("vec_id"), col("embedding"), lshBucket(col("embedding"), nPlanes, dim).as("sig"))
      .cache()
    val banded = sig.select(col("vec_id"),
      posexplode(array((0 until bands).map(bIdx =>
        col("sig").substr(bIdx * bitsPerBand + 1, bitsPerBand)): _*))
        .as(Seq("band_id", "bits")))
    val candidates = banded.select(col("band_id"), col("bits"), col("vec_id").as("id_a"))
      .join(banded.select(col("band_id"), col("bits"), col("vec_id").as("id_b")),
        Seq("band_id", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    candidates
      .join(sig.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(sig.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** IVF ANN (builder brief's second scale path beside LSH): a coarse
    * quantizer of `nCentroids` centroids partitions the corpus into
    * inverted lists; each query probes its `nProbe` nearest centroids
    * and scores EXACT cosine only within those lists — the candidate
    * set shrinks by ~nProbe/nCentroids versus a full scan.
    *
    * Centroids here are deterministic seeds (the `nCentroids`
    * lowest-id corpus vectors) rather than learned k-means means:
    * reproducible across runs AND expressible in the DuckDB oracle —
    * the list-assignment/probe/score pipeline is identical either
    * way, so swapping in trained centroids (e.g. Spark ML KMeans) on
    * a real deployment changes recall, not the plan. Scale shape: the
    * centroid table broadcasts (nCentroids rows); assignment is a
    * narrow argmax map over the corpus; the only shuffles are the
    * assignment window and the final per-query top-k.
    */
  /** Deterministic coarse-quantizer seeds: the `n` lowest-id corpus
    * vectors (see [[ivfTopK]]'s centroid note). Broadcast — n rows.
    */
  def seedCentroids(corpus: DataFrame, n: Int): DataFrame =
    broadcast(corpus
      .orderBy(md5(concat(lit("seed:"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(n)
      .select(col("vec_id").as("cid"), col("embedding").as("ce")))

  /** Nearest-centroid assignment via crossJoin + per-vector argmax
    * window — KEPT ONLY as the independent reference formulation for
    * the literal≡frame parity spec. NOT public API: the argmax window
    * repartitions the whole corpus on vec_id, which at 100 TB is a
    * full-corpus shuffle [[ivfAssignLit]] avoids entirely. All
    * production callers go through the literal-codebook narrow map.
    */
  private[graft] def ivfAssign(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(cents)
      .withColumn("csim", cosine(col("embedding"), col("ce")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("cid"), col("vec_id"), col("embedding"))
  }

  /** Driver-side bounded fetch of `n` corpus vectors — the
    * "train the quantizer on a sample" step every IVF/PQ deployment
    * runs before indexing (n rows, one job; the literal-codebook
    * analogue of [[probeDim]]). Selection is the k lowest SALTED-HASH
    * priorities (`md5('seed:'||vec_id)`, ties by id) — a deterministic
    * uniform reservoir over the whole corpus, SQL-replayable in the
    * oracle, where "n lowest ids" would train on whatever shard
    * happens to sort first at 100 TB (id order correlates with
    * ingest order, not content).
    */
  def collectSeeds(corpus: DataFrame, n: Int): Seq[(Long, Array[Float])] =
    corpus
      .orderBy(md5(concat(lit("seed:"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(n)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  /** The collected seeds as a broadcast (cid, ce) LOCAL relation — the
    * probe-side centroid table without re-scanning the corpus for the
    * same n rows [[collectSeeds]] already fetched.
    */
  def seedFrame(spark: org.apache.spark.sql.SparkSession,
                seeds: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    broadcast(seeds.toDF("cid", "ce"))
  }

  /** [[ivfAssign]] as a NARROW map: the centroid table folds in as
    * plan-time literals (the lshBucket hyperplane convention), the
    * per-row argmax is an in-row fold over the candidate array — no
    * corpus × centroids row blowup, no per-vector window, NO SHUFFLE.
    * At 100 TB [[ivfAssign]]'s argmax window repartitions the whole
    * corpus; this is a scan. Semantics identical (argmax cosine, ties
    * to the lowest cid — the fold keeps the earlier entry of the
    * cid-ascending candidate array on ties; parity-spec'd).
    * Zero-norm vectors (either side) are handled BEFORE the division:
    * double division follows IEEE 754 even under ANSI mode (only
    * integral /0 errors), so 0/0 would yield NaN — and Spark orders
    * NaN GREATER than any number, letting it win the argmax. The
    * guard computes the cosine only when the norm product is positive
    * and demotes NaN/null (zero-norm or NaN-element data) to −∞. A
    * row at −∞ against every centroid is dropped, not mis-assigned.
    */
  def ivfAssignLit(corpus: DataFrame,
                   seeds: Seq[(Long, Array[Float])]): DataFrame = {
    require(seeds.nonEmpty, "ivfAssignLit needs at least one seed centroid")
    val emb = col("embedding")
    val cands = array(seeds.sortBy(_._1).map { case (cid, ce) =>
      val denom = sqrt(normSq(emb)) * sqrt(normSq(lit(ce)))
      val cs = when(denom > 0, dot(emb, lit(ce)) / denom)
      val safe = when(cs.isNull || isnan(cs), lit(Double.NegativeInfinity)).otherwise(cs)
      struct(safe.as("csim"), lit(cid).as("cid"))
    }: _*)
    val best = aggregate(cands,
      struct(lit(Double.NegativeInfinity).as("csim"), lit(-1L).as("cid")),
      (acc, x) => when(x.getField("csim") > acc.getField("csim"), x).otherwise(acc))
    corpus
      .select(best.getField("cid").as("cid"), col("vec_id"), emb)
      .filter(col("cid") >= 0)
  }

  /** PQ encoding as a NARROW map (the [[ivfAssignLit]] treatment for
    * [[pqCodes]]): sub-codebooks fold in as literals, each subspace's
    * argmin is an in-row fold — versus pqCodes' m-way explode,
    * broadcast join, per-(vector,subspace) window and re-assembly
    * groupBy, which shuffles the corpus twice to build codes. Emits
    * the same m-ascending array<struct<m,`cidField`>> (ties to the
    * lowest centroid id; parity-spec'd against pqCodes).
    */
  def pqEncodeLit(vec: Column, seeds: Seq[(Long, Array[Double])], m: Int,
                  sub: Int, cidField: String): Column =
    array((0 until m).map { mi =>
      val cands = graft.functions.TextFunctions.bindOnce(
        slice(vec, mi * sub + 1, sub)) { sv =>
        array(seeds.sortBy(_._1).map { case (pcid, r) =>
          struct(sqL2(sv, lit(r.slice(mi * sub, mi * sub + sub))).as("d"),
            lit(pcid).as("pcid"))
        }: _*)
      }
      val best = aggregate(cands,
        struct(lit(Double.PositiveInfinity).as("d"), lit(-1L).as("pcid")),
        (acc, x) => when(x.getField("d") < acc.getField("d"), x).otherwise(acc))
      struct(lit(mi).as("m"), best.getField("pcid").as(cidField))
    }: _*)

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with a coarse quantizer,
    * then WITHIN each cluster drop every vector that has a
    * lower-id cluster-mate with cosine >= `tau` (the paper keeps one
    * representative per semantic-duplicate group; lowest id is our
    * deterministic choice). Emits the dropped rows with their
    * keeper = the argmax-cosine lower-id mate (ties to lowest id).
    *
    * Scale shape: the all-pairs comparison is confined to clusters,
    * so cost is sum(|cluster|^2) — bounded by choosing nCentroids
    * proportional to corpus size (the paper uses ~sqrt(N) k-means
    * cells at 100M+ scale, keeping cluster size ~constant); the
    * centroid table stays a broadcast and the pair join shuffles on
    * cid. Swapping seed centroids for trained k-means means changes
    * recall only, exactly as in [[ivfTopK]].
    */
  def semanticDedup(corpus: DataFrame, tau: Double,
                    nCentroids: Int = 8): DataFrame = {
    val seeds = collectSeeds(corpus, nCentroids)
    // cache: both sides of the within-cluster self-join read the
    // assignment — without the barrier the narrow assignment map (and
    // the corpus scan under it) runs twice (the minhashLshPairs
    // self-join trap). Literal-codebook assignment: no shuffle to
    // build the clustering (empty corpus → empty frame-path fallback).
    // seeds.isEmpty ⇔ the corpus itself is empty — emit the empty
    // assignment schema directly instead of routing through the
    // window-variant ivfAssign (parity-spec-only formulation)
    val assigned = (if (seeds.isEmpty)
        corpus.select(lit(-1L).as("cid"), col("vec_id"), col("embedding"))
          .filter(lit(false))
      else ivfAssignLit(corpus, seeds)).cache()
    val a = assigned.select(col("cid"), col("vec_id").as("keeper"), col("embedding").as("ea"))
    val b = assigned.select(col("cid"), col("vec_id"), col("embedding").as("eb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("keeper"))
    a.join(b, "cid")
      .filter(col("keeper") < col("vec_id"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= tau)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("cid"), col("keeper"), col("cos"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 8, nProbe: Int = 2): DataFrame = {
    // corpus-side assignment is the narrow literal map (no shuffle);
    // the probe side joins the tiny queries against the SAME collected
    // seeds as a local relation (no second corpus top-n scan)
    val seeds = collectSeeds(corpus, nCentroids)
    val cents = if (seeds.isEmpty) seedCentroids(corpus, nCentroids)
      else seedFrame(corpus.sparkSession, seeds)
    val assigned =
      if (seeds.isEmpty) ivfAssign(corpus, cents) else ivfAssignLit(corpus, seeds)
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("cid"))
    val probes = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(cents)
      .withColumn("csim", cosine(col("qe"), col("ce")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qe"), col("cid"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    probes.join(assigned, "cid")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Squared L2 between two float-array columns — the same sequential
    * IEEE fold as [[dot]] (bit-identical to DuckDB's `list_reduce`).
    */
  def sqL2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Product-quantization codebook (Jégou, Douze, Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search"): the embedding space is
    * split into `m` contiguous subspaces of dim/m dims; each subspace
    * gets `k` centroids. Centroids are deterministic seeds — the
    * subvectors of the `k` lowest-id corpus vectors (the
    * [[seedCentroids]] convention: reproducible AND oracle-expressible;
    * swapping in per-subspace k-means means changes recall, not the
    * plan). Emits (m, cid, csub), broadcast — m*k rows.
    */
  def pqCodebook(corpus: DataFrame, m: Int, k: Int, dim: Int): DataFrame = {
    val sub = dim / m
    broadcast(corpus
      .orderBy(md5(concat(lit("seed:"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cid"),
        posexplode(array((0 until m).map(i => slice(col("embedding"), i * sub + 1, sub)): _*))
          .as(Seq("m", "csub"))))
  }

  /** PQ encoding: per vector, the argmin-L2 centroid per subspace —
    * (vec_id, codes: array<struct<m,cid>> sorted by m). THIS is the
    * 100 TB artifact: m small ints per vector instead of dim floats
    * (64-dim float ≈ 256 B → 4 codes ≈ 4 B, a 64× smaller scan), built
    * once like any index. Shape: subspace explode (bounded ×m), a
    * broadcast join against the m*k-row codebook, one bounded argmin
    * window keyed (vec_id, m), one groupBy to assemble the code array.
    */
  def pqCodes(corpus: DataFrame, codebook: DataFrame, m: Int, dim: Int): DataFrame = {
    val sub = dim / m
    val subs = corpus.select(col("vec_id"),
      posexplode(array((0 until m).map(i => slice(col("embedding"), i * sub + 1, sub)): _*))
        .as(Seq("m", "sub")))
    val w = Window.partitionBy(col("vec_id"), col("m")).orderBy(col("d").asc, col("cid"))
    subs.join(codebook, "m")
      .withColumn("d", sqL2(col("sub"), col("csub")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("cid")))).as("codes"))
  }

  /** PQ ADC (asymmetric distance computation) top-k: each query
    * precomputes its m×k distance table to every sub-centroid; a corpus
    * vector's approximate distance is then m TABLE LOOKUPS summed in
    * subspace order — the query plane never touches raw embeddings,
    * only the compressed code column. The per-query tables ship as a
    * broadcast map keyed "m:cid"; scoring is a narrow fold over the
    * codes array; the only shuffle is the per-query top-k window
    * (replaceable by per-partition top-k + merge for small k).
    * Distances fold in ascending m — the DuckDB oracle's
    * `list(d ORDER BY m)` reduce — so adist is bit-identical.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
             nCentroids: Int = 8, knownDim: Int = -1): DataFrame = {
    val dim = if (knownDim > 0) knownDim else probeDim(corpus)
    val sub = dim / m
    // corpus encoding is the narrow literal map (pqCodes' explode +
    // broadcast join + window + groupBy shuffles the corpus twice to
    // build what is a per-row argmin — parity-spec'd equal); the tiny
    // query-side ADC tables join the SAME collected seeds as a local
    // codebook relation (no second corpus top-n scan)
    val seeds = collectSeeds(corpus, nCentroids)
    val cb = if (seeds.isEmpty) pqCodebook(corpus, m, nCentroids, dim)
      else {
        import corpus.sparkSession.implicits._
        broadcast(seeds.flatMap { case (cid, ce) =>
          (0 until m).map(mi => (cid, mi, ce.slice(mi * sub, mi * sub + sub)))
        }.toDF("cid", "m", "csub"))
      }
    val codes =
      if (seeds.isEmpty) pqCodes(corpus, cb, m, dim)
      else corpus.select(col("vec_id"),
        pqEncodeLit(col("embedding"),
          seeds.map { case (cid, ce) => (cid, ce.map(_.toDouble)) },
          m, sub, "cid").as("codes"))
    val qsubs = queries.select(col("vec_id").as("qid"),
      posexplode(array((0 until m).map(i => slice(col("embedding"), i * sub + 1, sub)): _*))
        .as(Seq("m", "qsub")))
    val qmaps = broadcast(qsubs.join(cb, "m")
      .withColumn("d", sqL2(col("qsub"), col("csub")))
      .groupBy(col("qid"))
      .agg(map_from_entries(collect_list(struct(
        concat_ws(":", col("m"), col("cid")), col("d")))).as("dtab")))
    val adist = aggregate(col("codes"), lit(0.0), (acc, e) =>
      acc + element_at(col("dtab"), concat_ws(":", e.getField("m"), e.getField("cid"))))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
    codes.crossJoin(qmaps)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("adist"), col("rank"))
  }

  /** IVFADC top-k (Jégou, Douze, Schmid 2011 §IV — the full FAISS-style
    * `IVFx,PQy` index): coarse quantizer restricts candidates to the
    * query's `nProbe` nearest cells, and within a cell distances are
    * computed by ADC over product-quantized RESIDUALS (x − coarse
    * centroid). Combines [[ivfTopK]]'s pruning (scan 1/nCells of the
    * corpus) with [[pqTopK]]'s compression (m code bytes per vector):
    * at 100 TB the scan reads only the (cid, codes) columns of the
    * probed cells — never a raw embedding.
    *
    * One product quantizer is shared across cells (the paper's choice:
    * residual distributions are near-identical across cells, and
    * per-cell codebooks would multiply the broadcast by nCells).
    * Because residuals depend on the assigned cell, each query builds
    * one ADC table PER PROBED CELL from its own residual q − c(cell)
    * — queries × nProbe × m × k entries, still a broadcast.
    *
    * Determinism: coarse seeds are the [[seedCentroids]] convention;
    * PQ seeds are the residuals of the `pqK` lowest-id vectors; every
    * distance is a sequential IEEE fold, so the DuckDB oracle matches
    * bit-for-bit. Swapping seeds for trained k-means changes recall
    * only — the plan is identical.
    */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
                nCells: Int = 8, pqK: Int = 8, nProbe: Int = 2,
                knownDim: Int = -1): DataFrame = {
    val dim = if (knownDim > 0) knownDim else probeDim(corpus)
    val sub = dim / m
    def empty = corpus.limit(0).select(col("vec_id").as("qid"), col("vec_id"),
      lit(0.0).as("adist"), lit(1).as("rank"))
    val seeds = collectSeeds(corpus, nCells)
    if (seeds.isEmpty) return empty
    val cents = seedFrame(corpus.sparkSession, seeds)
    // residual per assigned vector: x − c(cell) — assignment AND the
    // centroid lookup are literal-folded, so residuals are one narrow
    // map over the corpus (no crossJoin, no argmax window shuffle)
    val ceMap = map_from_entries(array(seeds.sortBy(_._1).map { case (cid, ce) =>
      struct(lit(cid), lit(ce))
    }: _*))
    val resid = ivfAssignLit(corpus, seeds)
      .select(col("cid"), col("vec_id"),
        zip_with(col("embedding"), element_at(ceMap, col("cid")),
          (x, c) => x.cast("double") - c.cast("double")).as("resid"))
    // PQ seeds = residuals of the pqK lowest salted-hash priorities
    // (the collectSeeds sampling convention, salt "pqseed:"), fetched
    // driver-side through the SAME Spark arithmetic (one bounded job;
    // no cache barrier needed — the only other resid reader is the
    // single lazy code scan)
    val pqSeeds = resid
      .orderBy(md5(concat(lit("pqseed:"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(pqK)
      .select(col("vec_id"), col("resid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    if (pqSeeds.isEmpty) return empty
    val codes = resid.select(col("cid"), col("vec_id"),
      pqEncodeLit(col("resid"), pqSeeds, m, sub, "pcid").as("codes"))
    // the tiny query-side ADC tables join the collected PQ seeds as a
    // local codebook relation (no corpus re-scan)
    val rsubs = (rcol: String) =>
      posexplode(array((0 until m).map(i => slice(col(rcol), i * sub + 1, sub)): _*))
        .as(Seq("m", "sv"))
    val cb = {
      import corpus.sparkSession.implicits._
      broadcast(pqSeeds.flatMap { case (pcid, r) =>
        (0 until m).map(mi => (pcid, mi, r.slice(mi * sub, mi * sub + sub)))
      }.toDF("pcid", "m", "csub"))
    }
    // probe: per query, the nProbe nearest coarse cells (as ivfTopK)
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val probes = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(cents)
      .withColumn("csim", cosine(col("qe"), col("ce")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("cid"),
        zip_with(col("qe"), col("ce"),
          (x, c) => x.cast("double") - c.cast("double")).as("qresid"))
    // per-(query, probed-cell) ADC table over the query's cell residual
    val qmaps = broadcast(probes
      .select(col("qid"), col("cid"), rsubs("qresid"))
      .join(cb, "m")
      .withColumn("d", sqL2(col("sv"), col("csub")))
      .groupBy(col("qid"), col("cid"))
      .agg(map_from_entries(collect_list(struct(
        concat_ws(":", col("m"), col("pcid")), col("d")))).as("dtab")))
    val adist = aggregate(col("codes"), lit(0.0), (acc, e) =>
      acc + element_at(col("dtab"), concat_ws(":", e.getField("m"), e.getField("pcid"))))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
    codes.join(qmaps, "cid")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("adist"), col("rank"))
  }

  /** Bucketed ANN: per-query candidate count + exact top-k within the
    * query's bucket (the scale path: score only same-bucket vectors).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8,
              knownDim: Int = -1): DataFrame = {
    val dim = if (knownDim > 0) knownDim else probeDim(corpus)
    val bucketed = corpus.select(
      col("vec_id"), col("embedding"), lshBucket(col("embedding"), nPlanes, dim).as("bucket"))
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qe"),
      lshBucket(col("embedding"), nPlanes, dim).as("bucket")))
    val scored = bucketed.join(q, Seq("bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("bucket"), col("vec_id"), col("cos"), col("rank"))
  }

  // ─── Trained quantizers (round-4: Lloyd's k-means codebooks) ─────
  // Driver-side Lloyd iterations on a bounded sample — the "train the
  // quantizer on a sample" step every IVF/PQ deployment runs before
  // indexing (Jégou 2011 §V trains on learning sets ~100k vectors; at
  // 100 TB the sample stays driver-sized while the codebook ships to
  // every executor as plan-time literals through the SAME plumbing the
  // seeded variants use — the plan is identical, only recall changes).
  // Every step is deterministic AND oracle-expressible: seeds are the
  // k lowest-id sample vectors, assignment ties break to the lowest
  // cid, and each centroid-position mean folds members left-to-right
  // in vec_id order — the exact arithmetic DuckDB spells as
  // list_reduce(list(v ORDER BY vec_id), (x,y) -> x+y) / COUNT(*), so
  // trained-codebook queries hash-match the oracle bit-for-bit.

  /** Left-to-right IEEE dot product of two double arrays (the driver
    * twin of [[dot]]/DuckDB `list_reduce` — same fold order).
    */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Left-to-right squared-L2 fold — the driver twin of [[sqL2]]. */
  private def sqL2D(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Argmax-cosine assignment, ties to the lowest cid (`cents` must be
    * cid-ascending; strict > keeps the earlier entry) — the driver twin
    * of [[ivfAssignLitD]]'s fold and the oracle's
    * `ROW_NUMBER() OVER (ORDER BY csim DESC, cid)`.
    */
  private def assignCosineD(x: Array[Double],
                            cents: Seq[(Long, Array[Double])]): Long = {
    val nx = math.sqrt(dotD(x, x))
    var best = -1L
    var bestSim = Double.NegativeInfinity
    cents.foreach { case (cid, ce) =>
      val denom = nx * math.sqrt(dotD(ce, ce))
      val cs = if (denom > 0) dotD(x, ce) / denom else Double.NegativeInfinity
      val safe = if (cs.isNaN) Double.NegativeInfinity else cs
      if (safe > bestSim) { bestSim = safe; best = cid }
    }
    best
  }

  private def assignL2D(x: Array[Double],
                        cents: Seq[(Long, Array[Double])]): Long = {
    var best = -1L
    var bestD = Double.PositiveInfinity
    cents.foreach { case (cid, ce) =>
      val d = sqL2D(x, ce)
      if (d < bestD) { bestD = d; best = cid }
    }
    best
  }

  /** One mean update: each centroid becomes the element-wise mean of
    * its members, folded in vec_id order (pts must be id-ascending);
    * an empty cluster keeps its previous centroid.
    */
  private def meanUpdate(pts: Seq[(Long, Array[Double])], assign: Seq[Long],
                         cents: Seq[(Long, Array[Double])]): Seq[(Long, Array[Double])] =
    cents.map { case (cid, old) =>
      val members = pts.zip(assign).collect { case ((_, v), a) if a == cid => v }
      if (members.isEmpty) (cid, old)
      else {
        val d = old.length
        val acc = new Array[Double](d)
        members.foreach { v =>
          var i = 0; while (i < d) { acc(i) += v(i); i += 1 }
        }
        var i = 0
        while (i < d) { acc(i) /= members.size; i += 1 }
        (cid, acc)
      }
    }

  private def lloyd(sample: Seq[(Long, Array[Double])], k: Int, iters: Int,
                    assignFn: (Array[Double], Seq[(Long, Array[Double])]) => Long)
      : Seq[(Long, Array[Double])] = {
    val pts = sample.sortBy(_._1)
    var cents = pts.take(k).map { case (id, v) => (id, v.clone()) }
    var it = 0
    while (it < iters && cents.nonEmpty) {
      val assign = pts.map { case (_, v) => assignFn(v, cents) }
      cents = meanUpdate(pts, assign, cents)
      it += 1
    }
    cents
  }

  /** Spherical (cosine-assignment) k-means for the IVF coarse
    * quantizer: cluster ids are the seed vec_ids (stable across
    * iterations — the tie-break convention survives training).
    */
  def kmeansCosine(sample: Seq[(Long, Array[Float])], k: Int,
                   iters: Int): Seq[(Long, Array[Double])] =
    lloyd(sample.map { case (id, v) => (id, v.map(_.toDouble)) },
      k, iters, assignCosineD)

  /** L2 k-means over pre-sliced (sub)vectors — the PQ per-subspace
    * trainer.
    */
  def kmeansL2(sample: Seq[(Long, Array[Double])], k: Int,
               iters: Int): Seq[(Long, Array[Double])] =
    lloyd(sample, k, iters, assignL2D)

  /** Sequential-fold dot of a float-array column against a literal
    * double codebook row — zip_with casts the float side, products and
    * fold in doubles: bit-identical to the oracle's CAST-both `sqlDot`.
    */
  private def dotFD(a: Column, b: Array[Double]): Column =
    aggregate(zip_with(a, lit(b), (x, y) => x.cast("double") * y),
      lit(0.0), (acc, v) => acc + v)

  /** Same fold between two array COLUMNS (float × double). */
  private def dotColFD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** [[ivfAssignLit]] for a TRAINED (double) codebook: same shuffle-free
    * narrow argmax map; centroid norms are driver-computed plan-time
    * literals (the same left-to-right fold the oracle's
    * sqrt(list_reduce(...)) spells, so the division parity holds).
    */
  def ivfAssignLitD(corpus: DataFrame,
                    cents: Seq[(Long, Array[Double])]): DataFrame = {
    require(cents.nonEmpty, "ivfAssignLitD needs at least one centroid")
    val emb = col("embedding")
    val cands = array(cents.sortBy(_._1).map { case (cid, ce) =>
      val denom = sqrt(normSq(emb)) * lit(math.sqrt(dotD(ce, ce)))
      val cs = when(denom > 0, dotFD(emb, ce) / denom)
      val safe = when(cs.isNull || isnan(cs), lit(Double.NegativeInfinity)).otherwise(cs)
      struct(safe.as("csim"), lit(cid).as("cid"))
    }: _*)
    val best = aggregate(cands,
      struct(lit(Double.NegativeInfinity).as("csim"), lit(-1L).as("cid")),
      (acc, x) => when(x.getField("csim") > acc.getField("csim"), x).otherwise(acc))
    corpus
      .select(best.getField("cid").as("cid"), col("vec_id"), emb)
      .filter(col("cid") >= 0)
  }

  /** [[ivfTopK]] with a TRAINED coarse quantizer: k-means on the
    * `sampleN` lowest-id vectors (bounded driver sample), codebook into
    * the literal assignment map — the plan is [[ivfTopK]]'s exactly.
    */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int,
                     nCentroids: Int = 8, nProbe: Int = 2,
                     sampleN: Int = 256, iters: Int = 1): DataFrame = {
    def empty = corpus.limit(0).select(col("vec_id").as("qid"), col("vec_id"),
      lit(0.0).as("cos"), lit(1).as("rank"))
    val sample = collectSeeds(corpus, sampleN)
    if (sample.isEmpty) return empty
    val cents = kmeansCosine(sample, nCentroids, iters)
    val assigned = ivfAssignLitD(corpus, cents)
    import corpus.sparkSession.implicits._
    val centsDf = broadcast(
      cents.map { case (cid, ce) => (cid, ce, math.sqrt(dotD(ce, ce))) }
        .toDF("cid", "ce", "cn"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("cid"))
    val probes = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(centsDf)
      .withColumn("csim",
        dotColFD(col("qe"), col("ce")) / (sqrt(normSq(col("qe"))) * col("cn")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qe"), col("cid"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    probes.join(assigned, "cid")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Reassemble per-subspace codebooks into full-length rows: cluster
    * ids are the SAME k lowest-id sample vectors in every subspace (the
    * seed convention is id-based, not value-based), so row j of each
    * subspace concatenates into one codebook vector [[pqEncodeLit]]
    * slices back apart.
    */
  private def trainPqCodebook(sample: Seq[(Long, Array[Double])], m: Int,
                              sub: Int, k: Int, iters: Int): Seq[(Long, Array[Double])] = {
    val perSub = (0 until m).map { mi =>
      kmeansL2(sample.map { case (id, v) =>
        (id, v.slice(mi * sub, mi * sub + sub)) }, k, iters)
    }
    perSub.head.indices.map { j =>
      (perSub.head(j)._1, perSub.flatMap(s => s(j)._2).toArray)
    }
  }

  /** [[pqTopK]] with TRAINED per-subspace codebooks (L2 k-means on the
    * sample's subvectors). Encoding stays the narrow literal map.
    */
  def pqTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
                    nCentroids: Int = 8, sampleN: Int = 256, iters: Int = 1,
                    knownDim: Int = -1): DataFrame = {
    def empty = corpus.limit(0).select(col("vec_id").as("qid"), col("vec_id"),
      lit(0.0).as("adist"), lit(1).as("rank"))
    val sample = collectSeeds(corpus, sampleN)
    if (sample.isEmpty) return empty
    val dim = if (knownDim > 0) knownDim else probeDim(corpus)
    val sub = dim / m
    val cb = trainPqCodebook(
      sample.map { case (id, v) => (id, v.map(_.toDouble)) }, m, sub, nCentroids, iters)
    val codes = corpus.select(col("vec_id"),
      pqEncodeLit(col("embedding"), cb, m, sub, "cid").as("codes"))
    import corpus.sparkSession.implicits._
    val cbDf = broadcast(cb.flatMap { case (cid, ce) =>
      (0 until m).map(mi => (cid, mi, ce.slice(mi * sub, mi * sub + sub)))
    }.toDF("cid", "m", "csub"))
    val qsubs = queries.select(col("vec_id").as("qid"),
      posexplode(array((0 until m).map(i => slice(col("embedding"), i * sub + 1, sub)): _*))
        .as(Seq("m", "qsub")))
    val qmaps = broadcast(qsubs.join(cbDf, "m")
      .withColumn("d", sqL2(col("qsub"), col("csub")))
      .groupBy(col("qid"))
      .agg(map_from_entries(collect_list(struct(
        concat_ws(":", col("m"), col("cid")), col("d")))).as("dtab")))
    val adist = aggregate(col("codes"), lit(0.0), (acc, e) =>
      acc + element_at(col("dtab"), concat_ws(":", e.getField("m"), e.getField("cid"))))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
    codes.crossJoin(qmaps)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("adist"), col("rank"))
  }

  /** [[ivfpqTopK]] with BOTH quantizers trained: spherical k-means for
    * the coarse cells, then L2 k-means per subspace over the SAMPLE's
    * residuals (computed driver-side with the same assignment/subtract
    * arithmetic the distributed plan uses). Plan shape unchanged: raw
    * embeddings still never ride through scoring.
    */
  def ivfpqTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int,
                       m: Int = 4, nCells: Int = 8, pqK: Int = 8,
                       nProbe: Int = 2, sampleN: Int = 256, iters: Int = 1,
                       knownDim: Int = -1): DataFrame = {
    def empty = corpus.limit(0).select(col("vec_id").as("qid"), col("vec_id"),
      lit(0.0).as("adist"), lit(1).as("rank"))
    val sample = collectSeeds(corpus, sampleN)
    if (sample.isEmpty) return empty
    val dim = if (knownDim > 0) knownDim else probeDim(corpus)
    val sub = dim / m
    val cents = kmeansCosine(sample, nCells, iters)
    val centById = cents.toMap
    val sampleResid = sample.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      val ce = centById(assignCosineD(vd, cents))
      (id, vd.indices.map(i => vd(i) - ce(i)).toArray)
    }
    val pqCb = trainPqCodebook(sampleResid, m, sub, pqK, iters)
    val ceMap = map_from_entries(array(cents.sortBy(_._1).map { case (cid, ce) =>
      struct(lit(cid), lit(ce))
    }: _*))
    val resid = ivfAssignLitD(corpus, cents)
      .select(col("cid"), col("vec_id"),
        zip_with(col("embedding"), element_at(ceMap, col("cid")),
          (x, c) => x.cast("double") - c).as("resid"))
    val codes = resid.select(col("cid"), col("vec_id"),
      pqEncodeLit(col("resid"), pqCb, m, sub, "pcid").as("codes"))
    import corpus.sparkSession.implicits._
    val centsDf = broadcast(
      cents.map { case (cid, ce) => (cid, ce, math.sqrt(dotD(ce, ce))) }
        .toDF("cid", "ce", "cn"))
    val cbDf = broadcast(pqCb.flatMap { case (pcid, r) =>
      (0 until m).map(mi => (pcid, mi, r.slice(mi * sub, mi * sub + sub)))
    }.toDF("pcid", "m", "csub"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val probes = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(centsDf)
      .withColumn("csim",
        dotColFD(col("qe"), col("ce")) / (sqrt(normSq(col("qe"))) * col("cn")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("cid"),
        zip_with(col("qe"), col("ce"), (x, c) => x.cast("double") - c).as("qresid"))
    val qmaps = broadcast(probes
      .select(col("qid"), col("cid"),
        posexplode(array((0 until m).map(i => slice(col("qresid"), i * sub + 1, sub)): _*))
          .as(Seq("m", "sv")))
      .join(cbDf, "m")
      .withColumn("d", sqL2(col("sv"), col("csub")))
      .groupBy(col("qid"), col("cid"))
      .agg(map_from_entries(collect_list(struct(
        concat_ws(":", col("m"), col("pcid")), col("d")))).as("dtab")))
    val adist = aggregate(col("codes"), lit(0.0), (acc, e) =>
      acc + element_at(col("dtab"), concat_ws(":", e.getField("m"), e.getField("pcid"))))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
    codes.join(qmaps, "cid")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("adist"), col("rank"))
  }
}
