package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Column surface for [[ExifReader]] — the image-metadata
  * sibling of [[AudioCodec.compressedAudioMeta]]: header-only, no pixel
  * decode, null on anything malformed.
  */
object ExifMeta {

  private val ExifStruct = StructType(Seq(
    StructField("endian", StringType),
    StructField("wrapped", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("orientation", IntegerType),
    StructField("make", StringType),
    StructField("iso", IntegerType),
    StructField("fnum_num", LongType),
    StructField("fnum_den", LongType)))

  /** Static entry for codegen: parse → InternalRow or null. */
  def exifMetaCompute(bytes: Array[Byte]): InternalRow =
    ExifReader.parse(bytes) match {
      case Some(m) => InternalRow(UTF8String.fromString(m.endian),
        if (m.wrapped) 1 else 0, m.width, m.height, m.orientation,
        UTF8String.fromString(m.make), m.iso, m.fnumNum, m.fnumDen)
      case None => null
    }

  /** `exif_meta(binary) → struct<endian,wrapped,width,height,
    * orientation,make,iso,fnum_num,fnum_den>`.
    */
  case class ExifMetaExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = ExifStruct
    override def nullable: Boolean = true
    override def prettyName: String = "exif_meta"
    override protected def nullSafeEval(input: Any): Any =
      exifMetaCompute(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        InternalRow ${ev.value}_r = graft.multimodal.ExifMeta.exifMetaCompute($c);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }
      """)
    override protected def withNewChildInternal(newChild: Expression): ExifMetaExpr =
      copy(child = newChild)
  }

  def exifMeta(c: Column): Column =
    GraftColumnBridge.column(ExifMetaExpr(GraftColumnBridge.expression(c)))
}
