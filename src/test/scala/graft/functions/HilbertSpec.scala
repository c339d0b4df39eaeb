package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftbridge.HilbertKernel

/** The two properties that make Hilbert the layout curve: bijectivity
  * over the grid, and unit-step adjacency — consecutive curve positions
  * are always grid neighbors (Z-order violates this at every power-of-
  * two boundary, which is exactly its long-jump locality failure).
  */
class HilbertSpec extends AnyFunSuite {

  test("xy2d is a bijection over the 256×256 grid") {
    val seen = new Array[Boolean](256 * 256)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = HilbertKernel.xy2d(x.toLong, y.toLong)
      assert(d >= 0 && d < 65536, s"($x,$y) -> $d out of range")
      assert(!seen(d.toInt), s"($x,$y) -> $d collides")
      seen(d.toInt) = true
    }
  }

  test("consecutive curve positions are grid neighbors (unit steps, no jumps)") {
    // Invert by walking the full grid once (bijection already proven).
    val pos = new Array[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256)
      pos(HilbertKernel.xy2d(x.toLong, y.toLong).toInt) = (x, y)
    for (d <- 1 until 65536) {
      val (x0, y0) = pos(d - 1); val (x1, y1) = pos(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
  }
}
