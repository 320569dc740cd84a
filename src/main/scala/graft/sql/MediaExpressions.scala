package org.apache.spark.sql.graft

import graft.img.Media
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multimodal (audio/video) column expressions over the GMV1 opaque-binary
 * container (graft.img.Media — the codec itself is a documented
 * deterministic stub; this layer is the real Spark-side plumbing: typed
 * metadata struct, per-frame explode fan-out, windowed features). Sampled
 * frames are raw RGB, so the whole image surface (img_gray_rgb,
 * img_resize, img_luma_mean, phash dedup) composes downstream unchanged.
 */
case class MediaKind(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Media.kind(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.img.Media.kind($c))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** media_meta(bytes) → struct<w,h,rate,n,duration_ms> (audio: w=h=0). */
case class MediaMeta(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("rate", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any = {
    val (w, h, rate, n, dur) = Media.meta(v.asInstanceOf[Array[Byte]])
    InternalRow(w, h, rate, n, dur)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.MediaMeta.row($c)")
}
object MediaMeta {
  /** Codegen-callable struct builder. */
  def row(b: Array[Byte]): InternalRow = {
    val (w, h, rate, n, dur) = Media.meta(b)
    InternalRow(w, h, rate, n, dur)
  }
}

/** media_frame(bytes, i) → raw RGB frame. */
case class MediaFrame(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    Media.frame(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.img.Media.frame($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** media_frame_sample(bytes, step) → array<binary> of every step-th frame. */
case class MediaFrameSample(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(Media.sampleFrames(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int])
      .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) graft.img.Media.sampleFrames($a, $b))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** img_phash_rgb(rgb, w, h) → 64-bit DCT pHash of a RAW RGB buffer — the
  * sampled-frame flavor of img_phash (which decodes jpg/png first), so
  * frame-level near-dup composes with the pigeonhole index unchanged. */
case class ImgPhashRgb(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    graft.sql.K.imgPhashRgb(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int], c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.sql.K.imgPhashRgb($a, $b, $c)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
}

/** img_phash256(bytes) → array<bigint>[4] — 256-bit DCT pHash of an
  * encoded (jpg/png) image; the wide-fingerprint near-dup scale path. */
case class ImgPhash256(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(graft.sql.K.imgPhash256(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.sql.K.imgPhash256($c))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** img_phash256_rgb(rgb, w, h) → array<bigint>[4] over a RAW RGB buffer. */
case class ImgPhash256Rgb(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    new GenericArrayData(graft.sql.K.imgPhash256Rgb(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int], c.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.sql.K.imgPhash256Rgb($a, $b, $c))")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
}

/** audio_zcr_windows(bytes, win) → array<long> zero-crossing counts per
  * window (exact integers; see Media.audioZcrOf). */
case class AudioZcrWindows(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(Media.audioZcrWindows(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.img.Media.audioZcrWindows($a, $b))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** audio_rms_windows(bytes, win) → array<double> RMS per window. */
case class AudioRmsWindows(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(Media.audioRmsWindows(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.img.Media.audioRmsWindows($a, $b))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
