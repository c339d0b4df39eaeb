package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index for layout clustering — the locality-preserving
  * sibling of LayoutOps' Z-order (a Hilbert walk never makes the long
  * diagonal jumps interleaved bits make, so range scans touch fewer
  * distinct runs). Order-256 xy2d (coords 0..255), the classic
  * level-fold with quadrant rotation; all-integer, so the DuckDB
  * oracle's struct-fold replication is exact.
  */
object HilbertKernel {
  def xy2d(xIn: Long, yIn: Long): Long = {
    // Mask to the curve's domain: out-of-range bits would otherwise
    // smear through the reflections into colliding indices (the
    // expression accepts any LongType — the kernel is total, like
    // zValue's shift/mask construction, instead of trusting callers
    // to remember the mod-256 quantization).
    var x = xIn & 255L; var y = yIn & 255L; var d = 0L
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** hilbert_index(x, y) over 0..255-quantized coordinates. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernel.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftbridge.HilbertKernel.xy2d($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
