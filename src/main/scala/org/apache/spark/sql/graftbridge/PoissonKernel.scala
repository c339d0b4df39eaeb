package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernel for the Poisson-bootstrap per-row replica weights
  * (r17; see BootstrapOps). The expression form exploded B=32 rows per
  * order and, per exploded row, built the string
  * `concat(cast(key as string), ':', cast(b as string))`, ran Spark's
  * Md5 (which constructs a fresh MessageDigest per call), took the
  * first-8-hex-chars substring, and compared it lexicographically
  * against 9 literal hex thresholds — ~4.8 M expression-tree rows at
  * sf0.1 for integers each ROW can compute in one pass.
  *
  * Equality argument, step by step:
  *  - the hashed bytes are the UTF-8 of the same string (decimal long,
  *    ':', decimal int — ASCII, so UTF-8 == the characters);
  *  - `substr(md5hex, 1, 8) >= '<8 lowercase hex chars>'` on
  *    same-length lowercase hex compares exactly like the unsigned
  *    32-bit integer value of the first 4 digest bytes vs the
  *    threshold's `Long.parseLong(hex, 16)` (hex digits are
  *    0-9 < a-f in ASCII and both operands are zero-padded width-8 —
  *    the same argument BootstrapOps already relies on for the
  *    engine-parity of the thresholds);
  *  - the weight is the count of thresholds ≤ u, identical to the
  *    Σ CASE WHEN u >= t chain.
  *
  * BootstrapKernelSpec pins the per-(row, b) weight equality against
  * the expression form on the real orders table.
  */
object PoissonKernel {

  /** All B replica weights of one key: weights(b) = #{t : u(key, b) ≥ t}
    * with u = first 4 md5 bytes of "key:b" as an unsigned 32-bit value.
    */
  def weights(key: Long, b: Int, thresholds: Array[Long]): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](b)
    var i = 0
    while (i < b) {
      md.reset()
      val s = java.lang.Long.toString(key) + ":" + java.lang.Integer.toString(i)
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var w = 0L
      var j = 0
      while (j < thresholds.length) { if (u >= thresholds(j)) w += 1; j += 1 }
      out(i) = w
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Array of the B Poisson-bootstrap replica weights of a long key. */
case class PoissonWeights(child: Expression, b: Int, thresholds: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val tArr: Array[Long] = thresholds.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poisson_weights"

  override def nullSafeEval(a: Any): Any =
    PoissonKernel.weights(a.asInstanceOf[Long], b, tArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("poissonThresholds", tArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.PoissonKernel.weights($c, $b, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
