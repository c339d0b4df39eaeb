package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geohash encoder for spatial cell bucketing — the geographic sibling
  * of the Z-order/Hilbert layout kernels. Standard geohash IS a Z-order
  * curve over the (lon, lat) unit square with a base32 rendering:
  * 6 characters = 30 bits = a 15-bit longitude index interleaved with a
  * 15-bit latitude index (longitude first, per the public algorithm).
  *
  * The kernel quantizes each coordinate ONCE — floor((lat+90)/180·2¹⁵)
  * — and then works in pure integer bit arithmetic, so the DuckDB
  * oracle replicates it exactly (the quantization is two IEEE double
  * ops + floor, identical on both engines; everything after is shifts
  * and masks). Out-of-range inputs clamp to the domain edge: the
  * kernel is total, like HilbertKernel's masking.
  */
object GeohashKernel {
  private val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  def quantize(v: Double, lo: Double, span: Double): Long = {
    val q = math.floor((v - lo) / span * 32768.0).toLong
    if (q < 0L) 0L else if (q > 32767L) 32767L else q
  }

  /** 6-character geohash of (lat, lon) in degrees. */
  def encode(lat: Double, lon: Double): UTF8String = {
    val latq = quantize(lat, -90.0, 180.0)
    val lonq = quantize(lon, -180.0, 360.0)
    var code = 0L
    var i = 0
    while (i < 15) {
      code |= ((lonq >> (14 - i)) & 1L) << (29 - 2 * i)
      code |= ((latq >> (14 - i)) & 1L) << (28 - 2 * i)
      i += 1
    }
    val out = new Array[Char](6)
    var j = 0
    while (j < 6) {
      out(j) = alphabet.charAt(((code >> (25 - 5 * j)) & 31L).toInt)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** geohash6(lat, lon) — 6-char base32 cell id (~±0.6 km). */
case class Geohash6(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash6"

  override def nullSafeEval(a: Any, b: Any): Any =
    GeohashKernel.encode(a.asInstanceOf[Double], b.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftbridge.GeohashKernel.encode($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
