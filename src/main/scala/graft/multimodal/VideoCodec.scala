package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real, JDK-only video codec for MJPEG-in-AVI (round 3; completes the
  * multimodal trio beside [[ImageCodec]] and [[AudioCodec]]).
  *
  * AVI is a RIFF container (the same chunk grammar as WAV) and MJPEG
  * frames are plain JPEGs — so one codec family is fully expressible
  * with the JDK: the container walk is pure byte arithmetic and each
  * extracted frame decodes through `javax.imageio`. Same two tiers:
  *
  *  - [[sniff]]: header-only walk (avih main header + the first `vids`
  *    stream) for (codec, width, height, n_frames, fps). Never touches
  *    frame data — the metadata scan cost at 100 TB is a few hundred
  *    bytes per payload.
  *  - [[frames]]: walks the `movi` list and returns the raw JPEG bytes
  *    of every `..dc` chunk — real frame EXTRACTION; each frame then
  *    rides the image path ([[ImageCodec.sniff]]/[[ImageCodec.decodeStats]])
  *    for real per-frame decode. Frame sampling = take every k-th.
  *
  * [[encodeMjpegAvi]] synthesizes a deterministic MJPEG AVI (frames
  * encoded by ImageIO's JPEG writer) so queries can state container
  * structure — frame count, dimensions, sampled count — in closed form
  * for the DuckDB oracle. JPEG pixel values are lossy, so pixel-level
  * assertions live in the spec (tolerance-based), not the oracle.
  * Inter-frame codecs (H.264 etc.) are NOT in the JDK — that boundary
  * stands, documented; their frames would ride the same [[frames]]
  * signature.
  */
object VideoCodec {

  private def u8(bytes: Array[Byte], i: Int): Int = bytes(i) & 0xff
  private def le16(bytes: Array[Byte], i: Int): Int =
    u8(bytes, i) | (u8(bytes, i + 1) << 8)
  private def le32(bytes: Array[Byte], i: Int): Long =
    (u8(bytes, i) | (u8(bytes, i + 1) << 8) | (u8(bytes, i + 2) << 16) |
      (u8(bytes, i + 3).toLong << 24)) & 0xffffffffL
  private def tag(bytes: Array[Byte], i: Int): String =
    new String(bytes, i, 4, "US-ASCII")

  /** Header-only metadata: (codec, width, height, n_frames, fps); None
    * when the payload is not an AVI with an MJPG video stream. Walks
    * top-level RIFF chunks; inside `LIST hdrl` reads `avih`
    * (dwMicroSecPerFrame at +0, dwTotalFrames at +16, dwWidth/dwHeight
    * at +32/+36) and the first `strh` with fccType `vids` for the
    * handler fourcc.
    */
  def sniff(bytes: Array[Byte]): Option[(String, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 24) return None
    if (!(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ")) return None
    var width = 0; var height = 0; var nFrames = 0; var fps = 0
    var handler = ""
    def walk(from: Int, to: Int): Unit = {
      var i = from
      var sane = true
      while (sane && i + 8 <= to && i + 8 <= bytes.length) {
        val t = tag(bytes, i)
        val lenL = le32(bytes, i + 4)
        // corrupt length (high bit set / past end) would move the
        // cursor backwards after toInt truncation — terminate instead
        if (lenL < 0 || lenL > bytes.length.toLong - i - 8) sane = false
        else {
          val len = lenL.toInt
          val body = i + 8
          val bodyEnd = math.min(to, math.min(bytes.length, body + len))
          t match {
            case "LIST" => walk(body + 4, bodyEnd) // skip the list type fourcc
            case "avih" if len >= 40 && body + 40 <= bytes.length =>
              val usPerFrame = le32(bytes, body).toInt
              fps = if (usPerFrame > 0) math.round(1e6 / usPerFrame).toInt else 0
              nFrames = le32(bytes, body + 16).toInt
              width = le32(bytes, body + 32).toInt
              height = le32(bytes, body + 36).toInt
            case "strh" if len >= 8 && body + 8 <= bytes.length =>
              if (tag(bytes, body) == "vids" && handler.isEmpty)
                handler = tag(bytes, body + 4)
            case _ => ()
          }
          i = body + len + (len & 1)
        }
      }
    }
    walk(12, bytes.length)
    if (handler != "MJPG" || width <= 0 || height <= 0 || nFrames <= 0) None
    else Some(("mjpeg", width, height, nFrames, fps))
  }

  /** Real frame extraction: the raw JPEG payload of every video-data
    * chunk (`..dc`) in the `movi` list, in stream order. Empty for
    * non-AVI payloads.
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (sniff(bytes).isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var i = from
      var sane = true
      while (sane && i + 8 <= to && i + 8 <= bytes.length) {
        val t = tag(bytes, i)
        val lenL = le32(bytes, i + 4)
        if (lenL < 0 || lenL > bytes.length.toLong - i - 8) sane = false
        else {
          val len = lenL.toInt
          val body = i + 8
          val bodyEnd = math.min(to, math.min(bytes.length, body + len))
          if (t == "LIST" && body + 4 <= bytes.length) {
            val listType = tag(bytes, body)
            walk(body + 4, bodyEnd, inMovi || listType == "movi")
          } else if (inMovi && t.endsWith("dc") && bodyEnd > body) {
            out += java.util.Arrays.copyOfRange(bytes, body, bodyEnd)
          }
          i = body + len + (len & 1)
        }
      }
    }
    walk(12, bytes.length, inMovi = false)
    out.toSeq
  }

  /** Every k-th frame (0, k, 2k, …) — the real frame sampler. */
  def sampleFrames(bytes: Array[Byte], everyK: Int): Seq[Array[Byte]] = {
    require(everyK > 0)
    frames(bytes).zipWithIndex.collect { case (f, i) if i % everyK == 0 => f }
  }

  /** Deterministic MJPEG AVI: `nFrames` constant-gray w×h JPEG frames
    * (ImageIO's writer) in a minimal RIFF AVI container (avih + one
    * vids strh/strf + movi; no idx1 — our parser streams the movi
    * list directly).
    */
  def encodeMjpegAvi(w: Int, h: Int, nFrames: Int, fps: Int, gray: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0 && fps > 0)
    val frameBytes = (0 until nFrames).map { _ =>
      ImageCodec.encode(w, h, gray, 3) // JPEG
    }
    def chunk(tagS: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(8 + body.length + 1)
      out.write(tagS.getBytes("US-ASCII"))
      val len = body.length
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write((len >> 16) & 0xff); out.write((len >> 24) & 0xff)
      out.write(body)
      if ((len & 1) == 1) out.write(0) // word alignment pad
      out.toByteArray
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = new ByteArrayOutputStream()
      inner.write(listType.getBytes("US-ASCII"))
      bodies.foreach(inner.write)
      chunk("LIST", inner.toByteArray)
    }
    def u32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val maxFrame = frameBytes.map(_.length).max
    val avih = Array.concat(
      u32(1000000L / fps), u32(0L), u32(0L), u32(0x10L /* HASINDEX off, INTERLEAVED */),
      u32(nFrames.toLong), u32(0L), u32(1L), u32(maxFrame.toLong),
      u32(w.toLong), u32(h.toLong), u32(0L), u32(0L), u32(0L), u32(0L))
    val strh = Array.concat(
      "vids".getBytes("US-ASCII"), "MJPG".getBytes("US-ASCII"),
      u32(0L), u16(0), u16(0), u32(0L),
      u32(1L), u32(fps.toLong), // rate/scale: fps = dwRate/dwScale
      u32(0L), u32(nFrames.toLong), u32(maxFrame.toLong), u32(0xffffffffL),
      u32(0L), u16(0), u16(0), u16(w), u16(h))
    val strf = Array.concat( // BITMAPINFOHEADER
      u32(40L), u32(w.toLong), u32(h.toLong), u16(1), u16(24),
      "MJPG".getBytes("US-ASCII"), u32((w * h * 3).toLong),
      u32(0L), u32(0L), u32(0L), u32(0L))
    val hdrl = list("hdrl", Seq(
      chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frameBytes.map(fb => chunk("00dc", fb)))
    val riffBody = new ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"))
    riffBody.write(hdrl); riffBody.write(movi)
    val all = new ByteArrayOutputStream()
    all.write("RIFF".getBytes("US-ASCII"))
    all.write(u32(riffBody.size().toLong))
    riffBody.writeTo(all)
    all.toByteArray
  }

  // ---- Catalyst surface ----

  private val MetaStruct = StructType(Seq(
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("fps", IntegerType)))

  /** Static entry for codegen: header sniff → InternalRow or null. */
  def videoMetaCompute(bytes: Array[Byte]): InternalRow =
    sniff(bytes) match {
      case Some((c, w, h, n, fps)) =>
        InternalRow(UTF8String.fromString(c), w, h, n, fps)
      case None => null
    }

  /** `video_meta(binary) → struct<codec,width,height,n_frames,fps>` —
    * header-only, codegen'd, null for non-video payloads.
    */
  case class VideoMeta(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = MetaStruct
    override def nullable: Boolean = true
    override def prettyName: String = "video_meta"
    override protected def nullSafeEval(input: Any): Any =
      videoMetaCompute(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        InternalRow ${ev.value}_r = graft.multimodal.VideoCodec.videoMetaCompute($c);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }
      """)
    override protected def withNewChildInternal(newChild: Expression): VideoMeta =
      copy(child = newChild)
  }

  def videoMeta(c: Column): Column =
    GraftColumnBridge.column(VideoMeta(GraftColumnBridge.expression(c)))
}
