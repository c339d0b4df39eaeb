package graft.functions

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SortedLongJaccardKernel

/** Property tests for the native merge kernels against naive Set-based
  * references — randomized inputs catch the off-by-one/duplicate-edge
  * cases a handful of hand-picked examples miss.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val sortedDistinct: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted.toArray)

  private def ad(a: Array[Long]): ArrayData = ArrayData.toArrayData(a)

  test("intersectCount == |A ∩ B| for random sorted distinct arrays") {
    check(forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      SortedLongJaccardKernel.intersectCount(ad(a), ad(b)) ==
        a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("jaccard == |A ∩ B| / |A ∪ B| for random sorted distinct arrays") {
    check(forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val expected = {
        val u = a.toSet.union(b.toSet).size
        if (u == 0) 0.0 else a.toSet.intersect(b.toSet).size.toDouble / u
      }
      SortedLongJaccardKernel.compute(ad(a), ad(b)) == expected
    })
  }

  test("kernel identities: self-similarity 1 (non-empty), disjoint 0") {
    check(forAll(sortedDistinct) { a =>
      val self = SortedLongJaccardKernel.compute(ad(a), ad(a))
      val selfOk = if (a.isEmpty) self == 0.0 else self == 1.0
      val shifted = a.map(_ + 5000L) // disjoint by construction (range bound)
      selfOk && SortedLongJaccardKernel.intersectCount(ad(a), ad(shifted)) ==
        (if (a.isEmpty) 0L else 0L)
    })
  }
}
