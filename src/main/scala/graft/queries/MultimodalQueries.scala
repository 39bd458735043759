package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{AudioCodec, ImageCodec, Mp3Header, Multimodal, VideoCodec}

/** Multimodal-column queries over REAL image decode (round 3; r2's
  * deterministic fakes are gone). Each row synthesizes a real image
  * with closed-form dimensions/color derived from the documents table
  * (the extract_tables pattern: generate the payload in-query so the
  * DuckDB oracle can state the expected answer without a codec), then
  * the certified values come from actually decoding those bytes:
  *
  *  - media_meta: header-only metadata (PNG IHDR parse, codegen'd) —
  *    the scan-scale path that never inflates pixels.
  *  - media_decode: full `javax.imageio` pixel decode through the
  *    batched mapPartitions plumbing — width/height/mean-pixel read
  *    from the decoded raster. Formats rotate png/bmp/gif (the JDK's
  *    lossless trio; JPEG dims are spec-covered, its lossy pixels have
  *    no closed form).
  */
object MultimodalQueries {

  /** Synthesis UDF (test-harness side, not an operator): a real
    * constant-gray image of the given dims/format.
    */
  private val synthImage =
    udf((w: Int, h: Int, gray: Int, f: Int) => ImageCodec.encode(w, h, gray, f))

  private def withSynth(s: SparkSession, dir: String): DataFrame = {
    val n = octet_length(col("text").cast("binary"))
    Tables(s, dir, "documents").select(
      col("doc_id"),
      n.as("n_bytes"),
      (n % 24 + 8).cast("int").as("w"),
      (n % 16 + 8).cast("int").as("h"),
      (n % 256).cast("int").as("gray"),
      (n % 3).cast("int").as("fmt_idx"))
  }

  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    val media = withSynth(s, dir)
      .withColumn("bytes", synthImage(col("w"), col("h"), col("gray"), lit(0)))
      .withColumn("meta", Multimodal.decodeImage(col("bytes")))
    media.select(
      col("doc_id"),
      col("n_bytes"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      size(Multimodal.sampleFrames(col("bytes"), 2)).as("n_sampled"))
      .orderBy(col("doc_id"))
  }

  /** n_sampled has a closed form because the synthesized PNG is tiny:
    * octet_length < 1024 ⇒ one chunk ⇒ exactly one sampled frame.
    */
  val mediaMetaSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  'png' AS format,
      |  CAST(octet_length(encode(text)) % 24 + 8 AS INT) AS width,
      |  CAST(octet_length(encode(text)) % 16 + 8 AS INT) AS height,
      |  1 AS n_sampled
      |FROM documents ORDER BY doc_id""".stripMargin

  def mediaDecode(s: SparkSession, dir: String): DataFrame = {
    val media = withSynth(s, dir)
      .withColumn("bytes", synthImage(col("w"), col("h"), col("gray"), col("fmt_idx")))
      .cache() // see mediaVideo: one synthesis, two branch reads
    val sniffed = media.select(
      col("doc_id"), ImageCodec.imageMeta(col("bytes")).getField("format").as("format"))
    val feats = Multimodal.decodeBatched(media, "doc_id", "bytes")
    sniffed.join(feats, "doc_id")
      .select(
        col("doc_id"),
        col("format"),
        element_at(col("features"), 1).cast("int").as("dec_width"),
        element_at(col("features"), 2).cast("int").as("dec_height"),
        element_at(col("features"), 3).cast("int").as("avg_px"))
      .orderBy(col("doc_id"))
  }

  val mediaDecodeSql: String =
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
      |SELECT doc_id,
      |  CASE CAST(n % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'gif' END AS format,
      |  CAST(n % 24 + 8 AS INT) AS dec_width,
      |  CAST(n % 16 + 8 AS INT) AS dec_height,
      |  CAST(n % 256 AS INT) AS avg_px
      |FROM d ORDER BY doc_id""".stripMargin

  /** media_resize: the REAL resize kernel (decode → bilinear scale →
    * PNG re-encode) certified end-to-end: bilinear interpolation of a
    * constant image is the same constant, and the re-encode is
    * lossless, so the resized payload must decode to exactly
    * (16, 12, gray) — header dims AND pixel content both closed-form.
    */
  def mediaResize(s: SparkSession, dir: String): DataFrame = {
    val media = withSynth(s, dir)
      .withColumn("bytes", synthImage(col("w"), col("h"), col("gray"), lit(0)))
    val resized = Multimodal.resizeImages(media, "doc_id", "bytes", w = 16, h = 12)
      .cache() // one resize pass, two branch reads (meta + pixel stats)
    val feats = Multimodal.decodeBatched(resized, "doc_id", "resized")
    resized.select(
        col("doc_id"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))
      .join(feats, "doc_id")
      .select(col("doc_id").cast("bigint").as("doc_id"), // resize plumbing stringifies ids
        col("format"), col("width"), col("height"),
        element_at(col("features"), 3).cast("int").as("avg_px"))
      .orderBy(col("doc_id"))
  }

  val mediaResizeSql: String =
    """SELECT doc_id, 'png' AS format, 16 AS width, 12 AS height,
      |  CAST(octet_length(encode(text)) % 256 AS INT) AS avg_px
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Synthesis UDF for the audio path: a real mono 16-bit PCM WAV
    * square wave with closed-form peak/mean amplitude.
    */
  private val synthAudio =
    udf((n: Int, rate: Int, amp: Int) => AudioCodec.encodePcm16(n, rate, amp, 25))

  /** media_audio: REAL RIFF/WAVE metadata (header-only codegen'd
    * sniff) + full PCM sample decode through the batched plumbing.
    * The synthesized square wave alternates ±amp, so peak and
    * mean-absolute amplitude are both exactly amp/32768 (a dyadic
    * rational — bit-exact across engines).
    */
  def mediaAudio(s: SparkSession, dir: String): DataFrame = {
    val n = octet_length(col("text").cast("binary"))
    val media = Tables(s, dir, "documents").select(
      col("doc_id"),
      (n % 200 + 50).cast("int").as("ns"),
      (lit(8000) + (n % 4) * 4000).cast("int").as("rate"),
      ((n * 37) % 32768).cast("int").as("amp"))
      .withColumn("bytes", synthAudio(col("ns"), col("rate"), col("amp")))
      .cache() // see mediaVideo: one synthesis, two branch reads
    val meta = AudioCodec.audioMeta(col("bytes"))
    val feats = Multimodal.decodeBatched(media, "doc_id", "bytes",
      decodeBatch = Multimodal.audioFeatureBatch)
    media.select(
        col("doc_id"),
        meta.getField("codec").as("codec"),
        meta.getField("sample_rate").as("sample_rate"),
        meta.getField("n_samples").cast("int").as("n_samples"))
      .join(feats, "doc_id")
      .select(col("doc_id"), col("codec"), col("sample_rate"), col("n_samples"),
        element_at(col("features"), 2).cast("double").as("peak"),
        element_at(col("features"), 3).cast("double").as("mean_abs"))
      .orderBy(col("doc_id"))
  }

  val mediaAudioSql: String =
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
      |SELECT doc_id, 'pcm' AS codec,
      |  CAST(8000 + (n % 4) * 4000 AS INT) AS sample_rate,
      |  CAST(n % 200 + 50 AS INT) AS n_samples,
      |  CAST(n * 37 % 32768 AS DOUBLE) / 32768 AS peak,
      |  CAST(n * 37 % 32768 AS DOUBLE) / 32768 AS mean_abs
      |FROM d ORDER BY doc_id""".stripMargin

  /** Synthesis UDF for the video path: a real MJPEG AVI with
    * closed-form container structure.
    */
  private val synthVideo = udf((w: Int, h: Int, nf: Int, fps: Int, gray: Int) =>
    VideoCodec.encodeMjpegAvi(w, h, nf, fps, gray))

  /** media_video: REAL MJPEG-AVI metadata (header-only codegen'd RIFF
    * walk) + real frame extraction through [[Multimodal.sampleVideoFrames]]
    * (every 2nd frame), each sampled frame's dimensions re-read from
    * its own JPEG SOF header ([[ImageCodec.imageMeta]] — exact even
    * though JPEG pixels are lossy). Container structure, sampled
    * count, and per-frame dims all have closed forms for the oracle.
    */
  def mediaVideo(s: SparkSession, dir: String): DataFrame = {
    val n = octet_length(col("text").cast("binary"))
    val media = Tables(s, dir, "documents").select(
      col("doc_id"),
      (n % 24 + 8).cast("int").as("w"),
      (n % 16 + 8).cast("int").as("h"),
      (n % 6 + 2).cast("int").as("nf"),
      (lit(10) + (n % 3) * 5).cast("int").as("fps"),
      (n % 256).cast("int").as("gray"))
      .withColumn("bytes",
        synthVideo(col("w"), col("h"), col("nf"), col("fps"), col("gray")))
      // synthesis stand-in for a stored media table: cache so the meta
      // branch and the frame-sampling branch read the same payloads
      // instead of re-encoding every AVI twice (a real table would be
      // two cheap scans of parquet, not two UDF regenerations)
      .cache()
    val meta = VideoCodec.videoMeta(col("bytes"))
    val sampled = Multimodal.sampleVideoFrames(media, "doc_id", "bytes", everyK = 2)
      .withColumn("fm", ImageCodec.imageMeta(col("frame")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_sampled"),
        min(col("fm.width")).cast("int").as("dec_width"),
        min(col("fm.height")).cast("int").as("dec_height"))
    media.select(
        col("doc_id"),
        meta.getField("codec").as("codec"),
        meta.getField("width").as("width"),
        meta.getField("height").as("height"),
        meta.getField("n_frames").as("n_frames"),
        meta.getField("fps").as("fps"))
      .join(sampled, "doc_id")
      .orderBy(col("doc_id"))
  }

  val mediaVideoSql: String =
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
      |SELECT doc_id, 'mjpeg' AS codec,
      |  CAST(n % 24 + 8 AS INT) AS width,
      |  CAST(n % 16 + 8 AS INT) AS height,
      |  CAST(n % 6 + 2 AS INT) AS n_frames,
      |  CAST(10 + (n % 3) * 5 AS INT) AS fps,
      |  CAST((n % 6 + 2 + 1) // 2 AS INT) AS n_sampled,
      |  CAST(n % 24 + 8 AS INT) AS dec_width,
      |  CAST(n % 16 + 8 AS INT) AS dec_height
      |FROM d ORDER BY doc_id""".stripMargin

  /** Synthesis UDF for the perceptual-hash path: a real 9×8 PNG whose
    * nine column grays encode the low 9 bits of n (bit set → 220,
    * clear → 20) — at exactly 9×8 the dHash resize is the identity,
    * so every hash bit has the closed form "bit c clear AND bit c+1
    * set", one 8-bit row pattern repeated for all 8 rows.
    */
  private val synthColumns = udf { (n: Int) =>
    ImageCodec.encodePngColumns(
      Array.tabulate(9)(c => ((n >> c) & 1) * 200 + 20), 8)
  }

  private val dhashUdf =
    udf((b: Array[Byte]) => ImageCodec.dHashBits(b).orNull)

  /** media_phash: perceptual (difference-hash) image fingerprinting —
    * the multimodal near-dup detector: REAL decode → 9×8 gray →
    * pairwise column comparisons → 64-bit fingerprint (bit string, the
    * dedup_simhash convention), then exact-hash grouping counts the
    * perceptual duplicates. The kernel is the real dHash used on
    * arbitrary images (non-9×8 inputs go through the bilinear scale —
    * spec-covered); the synthesized 9×8 inputs make every bit
    * closed-form for the oracle. Scale: narrow per-row map + one
    * keyed count on the 64-char hash.
    */
  def mediaPhash(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("phash"))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text").cast("binary")).cast("int").as("n_bytes"))
      .withColumn("phash", dhashUdf(synthColumns(col("n_bytes"))))
      .withColumn("n_dup", count(lit(1)).over(w))
      .select(col("doc_id"), col("n_bytes"), col("phash"), col("n_dup"))
      .orderBy(col("doc_id"))
  }

  val mediaPhashSql: String =
    """WITH d AS (SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS INT) AS n_bytes FROM documents),
      |ph AS (SELECT doc_id, n_bytes, repeat(
      |    array_to_string(list_transform(range(8), c -> CASE
      |      WHEN (n_bytes >> CAST(c AS INT)) & 1 = 0
      |        AND (n_bytes >> (CAST(c AS INT) + 1)) & 1 = 1
      |      THEN '1' ELSE '0' END), ''), 8) AS phash
      |  FROM d)
      |SELECT doc_id, n_bytes, phash,
      |  COUNT(*) OVER (PARTITION BY phash) AS n_dup
      |FROM ph ORDER BY doc_id""".stripMargin

  /** media_audio_features: REAL framewise DSP over the decoded PCM —
    * RMS energy and zero-crossing rate per 100-sample frame, the two
    * features every audio-curation pipeline computes first (silence/
    * noise gating, speech-band heuristics). Sample sums are exact
    * longs from [[graft.multimodal.AudioCodec.frameFeatures]]; the
    * emitted RMS is sqrt(Σv²/n)/32768 — for the synthesized ±amp
    * square wave Σv² = n·amp² exactly, so the chain collapses to the
    * closed form amp/32768 the oracle states (sqrt of an exact square
    * is exact). Zero crossings have the closed form
    * floor((s+n−1)/hp) − floor(s/hp) for a wave flipping every hp
    * samples — the oracle derives frames with range() and replays it.
    */
  def mediaAudioFeatures(s: SparkSession, dir: String): DataFrame = {
    val n = octet_length(col("text").cast("binary"))
    val media = Tables(s, dir, "documents").select(
      col("doc_id"),
      (n % 200 + 50).cast("int").as("ns"),
      (lit(8000) + (n % 4) * 4000).cast("int").as("rate"),
      ((n * 37) % 32768).cast("int").as("amp"))
      .withColumn("bytes", synthAudio(col("ns"), col("rate"), col("amp")))
    Multimodal.audioFrames(media, "doc_id", "bytes", frameLen = 100)
      .select(col("doc_id").cast("bigint").as("doc_id"),
        col("frame_idx"), col("n"),
        (sqrt(col("sum_sq").cast("double") / col("n").cast("double"))
          / lit(32768.0)).as("rms"),
        col("zc"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mediaAudioFeaturesSql: String =
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
      |p AS (SELECT doc_id, CAST(nb % 200 + 50 AS BIGINT) AS ns,
      |    CAST(nb * 37 % 32768 AS BIGINT) AS amp FROM d),
      |f AS (SELECT doc_id, ns, amp,
      |    CAST(unnest(range(CAST((ns + 99) // 100 AS INT))) AS BIGINT) AS fi FROM p)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |  CAST(LEAST(100, ns - fi * 100) AS INT) AS n,
      |  CAST(amp AS DOUBLE) / 32768 AS rms,
      |  CAST(CASE WHEN amp > 0
      |    THEN (fi * 100 + LEAST(100, ns - fi * 100) - 1) // 25 - (fi * 100) // 25
      |    ELSE 0 END AS INT) AS zc
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Synthesis UDF for the compressed-audio path: a real CBR MP3 or
    * ADTS-AAC stream with closed-form frame structure (zero payload —
    * the header walk never looks at payload bytes, exactly the point).
    */
  private val synthCompressed = udf { (n: Int) =>
    if (n % 2 == 0)
      Mp3Header.encodeMp3(nFrames = n % 6 + 2,
        bitrateIdx = (n % 4) * 3 + 2, rateIdx = n % 3)
    else
      Mp3Header.encodeAdts(nFrames = n % 6 + 2,
        freqIdx = 4 + n % 3, chanConf = 2, payloadLen = n % 50 + 10)
  }

  /** media_mp3: REAL compressed-audio container metadata (r5 VERDICT
    * #6) — MP3 / ADTS-AAC frame-header walk via the codegen'd
    * [[AudioCodec.compressedAudioMeta]], no decode anywhere. Every
    * field is a closed form of the synthesis parameters: frame length
    * is the ISO integer formula, the average bitrate's frame count
    * cancels exactly (floor((nf·len·8·r)/(nf·spf·1000)) =
    * floor((len·8·r)/(spf·1000))), and duration is
    * n_samples·1000 div rate. Scale: narrow codegen'd map over the
    * payload column — a metadata scan of a 100 TB audio lake reads
    * headers only.
    */
  def mediaMp3(s: SparkSession, dir: String): DataFrame = {
    val n = octet_length(col("text").cast("binary"))
    val media = Tables(s, dir, "documents")
      .select(col("doc_id"), n.cast("int").as("n"))
      .withColumn("bytes", synthCompressed(col("n")))
    val m = AudioCodec.compressedAudioMeta(col("bytes"))
    media.select(
        col("doc_id"),
        m.getField("codec").as("codec"),
        m.getField("sample_rate").as("sample_rate"),
        m.getField("channels").as("channels"),
        m.getField("n_frames").as("n_frames"),
        m.getField("n_samples").as("n_samples"),
        m.getField("kbps").as("kbps"))
      .withColumn("duration_ms",
        expr("n_samples * 1000L div sample_rate").cast("long"))
      .orderBy(col("doc_id"))
  }

  val mediaMp3Sql: String =
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      |p AS (SELECT doc_id, n % 2 AS fam, n % 6 + 2 AS nf,
      |    CASE n % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS mrate,
      |    CASE n % 4 WHEN 0 THEN 40 WHEN 1 THEN 64 WHEN 2 THEN 112 ELSE 192 END AS mkbps,
      |    CASE n % 3 WHEN 0 THEN 44100 WHEN 1 THEN 32000 ELSE 24000 END AS arate,
      |    n % 50 + 17 AS aflen
      |  FROM d),
      |q AS (SELECT doc_id, fam, nf,
      |    CASE fam WHEN 0 THEN mrate ELSE arate END AS rate,
      |    CASE fam WHEN 0 THEN nf * 1152 ELSE nf * 1024 END AS nsamp,
      |    CASE fam WHEN 0 THEN ((144000 * mkbps) // mrate) * 8 * mrate // 1152000
      |         ELSE aflen * 8 * arate // 1024000 END AS kbps
      |  FROM p)
      |SELECT doc_id,
      |  CASE fam WHEN 0 THEN 'mp3' ELSE 'aac' END AS codec,
      |  CAST(rate AS INT) AS sample_rate,
      |  CAST(CASE fam WHEN 0 THEN 1 ELSE 2 END AS INT) AS channels,
      |  CAST(nf AS INT) AS n_frames,
      |  CAST(nsamp AS BIGINT) AS n_samples,
      |  CAST(kbps AS INT) AS kbps,
      |  CAST(nsamp * 1000 // rate AS BIGINT) AS duration_ms
      |FROM q ORDER BY doc_id""".stripMargin

  private val synthExif =
    udf((n: Int) => graft.multimodal.ExifReader.encode(
      bigEndian = n % 2 == 1, wrapJpeg = n % 3 == 0,
      width = n % 24 + 8, height = n % 16 + 8, orientation = n % 8 + 1,
      make = "cam" + (n % 5), iso = (n % 16 + 1) * 100,
      fnumNum = (n % 40 + 10).toLong, fnumDen = 10L))

  /** media_exif: REAL TIFF/EXIF metadata via the codegen'd
    * [[graft.multimodal.ExifMeta.exifMeta]] header walk — both byte
    * orders (doc-derived), bare TIFF and JPEG-APP1-wrapped streams,
    * IFD0 scalars, an ASCII tag behind an offset, and the EXIF sub-IFD
    * with an unsigned RATIONAL (f-number). Every emitted field is a
    * closed form of the synthesis parameter n, so the oracle states the
    * answer with no image library; f_stop is the rational's ONE
    * division. Scale: header-only narrow map — the 100 TB photo-lake
    * metadata scan that never touches pixel data.
    */
  def mediaExif(s: SparkSession, dir: String): DataFrame = {
    val n = octet_length(col("text").cast("binary"))
    val media = Tables(s, dir, "documents")
      .select(col("doc_id"), n.cast("int").as("n"))
      .withColumn("bytes", synthExif(col("n")))
    val m = graft.multimodal.ExifMeta.exifMeta(col("bytes"))
    media.select(
        col("doc_id"),
        m.getField("endian").as("endian"),
        m.getField("wrapped").as("wrapped"),
        m.getField("width").as("width"),
        m.getField("height").as("height"),
        m.getField("orientation").as("orientation"),
        m.getField("make").as("make"),
        m.getField("iso").as("iso"),
        m.getField("fnum_num").as("fnum_num"),
        m.getField("fnum_den").as("fnum_den"))
      .withColumn("f_stop",
        col("fnum_num").cast("double") / col("fnum_den").cast("double"))
      .orderBy(col("doc_id"))
  }

  val mediaExifSql: String =
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
      |SELECT doc_id,
      |  CASE WHEN n % 2 = 1 THEN 'MM' ELSE 'II' END AS endian,
      |  CAST(CASE WHEN n % 3 = 0 THEN 1 ELSE 0 END AS INT) AS wrapped,
      |  CAST(n % 24 + 8 AS INT) AS width,
      |  CAST(n % 16 + 8 AS INT) AS height,
      |  CAST(n % 8 + 1 AS INT) AS orientation,
      |  'cam' || CAST(n % 5 AS VARCHAR) AS make,
      |  CAST((n % 16 + 1) * 100 AS INT) AS iso,
      |  CAST(n % 40 + 10 AS BIGINT) AS fnum_num,
      |  CAST(10 AS BIGINT) AS fnum_den,
      |  CAST(n % 40 + 10 AS DOUBLE) / CAST(10 AS DOUBLE) AS f_stop
      |FROM d ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_exif" -> (mediaExif _),
    "media_audio_features" -> (mediaAudioFeatures _),
    "media_mp3" -> (mediaMp3 _),
    "media_meta" -> (mediaMeta _),
    "media_decode" -> (mediaDecode _),
    "media_resize" -> (mediaResize _),
    "media_audio" -> (mediaAudio _),
    "media_video" -> (mediaVideo _),
    "media_phash" -> (mediaPhash _))

  val oracles: Map[String, String] = Map(
    "media_exif" -> mediaExifSql,
    "media_audio_features" -> mediaAudioFeaturesSql,
    "media_mp3" -> mediaMp3Sql,
    "media_meta" -> mediaMetaSql,
    "media_decode" -> mediaDecodeSql,
    "media_resize" -> mediaResizeSql,
    "media_audio" -> mediaAudioSql,
    "media_video" -> mediaVideoSql,
    "media_phash" -> mediaPhashSql)
}
