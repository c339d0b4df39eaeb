package graft.functions

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.{Prop, Test => SCTest}

import org.apache.spark.sql.graftbridge.EditDistanceKernel
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Edit-distance kernels: values pinned against DuckDB 1.0 (the oracle
  * engine — the q_fuzzy_link gate depends on bit-identical doubles),
  * metric properties fuzzed against naive references, and the codegen
  * path exercised through a real DataFrame select.
  */
class EditDistanceSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    EditDistanceKernel.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
  private def dl(a: String, b: String): Long =
    EditDistanceKernel.damerauLevenshtein(UTF8String.fromString(a), UTF8String.fromString(b))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val shortStr: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'e')).map(_.mkString))

  test("jaro-winkler matches DuckDB bit-for-bit on pinned pairs") {
    // Exact doubles fetched from duckdb 1.0 jaro_winkler_similarity.
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("TRATE", "TRACE") == 0.9066666666666667)
    // jaro exactly 2/3 — below the 0.7 boost threshold, no prefix bonus.
    assert(jw("ac", "ab") == 0.6666666666666666)
    // Below-threshold despite a 2-char common prefix — no boost.
    assert(jw("abcdef", "abzxyw") == 0.5555555555555555)
    // ABOVE threshold with zero common prefix — boost fires but adds 0
    // (the l == 0 branch of the prefix scan).
    assert(jw("abcd", "bacd") == 0.9166666666666666)
    assert(jw("zbcdef", "abcdef") == 0.888888888888889)
    assert(jw("", "") == 0.0)
    assert(jw("ab", "") == 0.0)
    assert(jw("a", "a") == 1.0)
  }

  test("damerau-levenshtein matches DuckDB on pinned pairs (TRUE variant, not OSA)") {
    assert(dl("CA", "ABC") == 2L) // OSA would say 3 — the distinguishing case
    assert(dl("abcdef", "abdcef") == 1L)
    assert(dl("xy", "yx") == 1L)
    assert(dl("", "abc") == 3L)
    assert(dl("kitten", "sitting") == 3L)
  }

  private def naiveLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  test("DL properties: symmetric, 0 iff equal, ≤ Levenshtein, triangle inequality") {
    check(forAll(shortStr, shortStr) { (a, b) =>
      dl(a, b) == dl(b, a) &&
        ((dl(a, b) == 0L) == (a == b)) &&
        dl(a, b) <= naiveLev(a, b).toLong
    })
    check(forAll(shortStr, shortStr, shortStr) { (a, b, c) =>
      dl(a, c) <= dl(a, b) + dl(b, c)
    })
  }

  test("JW properties: bounded [0,1], symmetric, self-similarity 1 when non-empty") {
    check(forAll(shortStr, shortStr) { (a, b) =>
      val v = jw(a, b)
      v >= 0.0 && v <= 1.0 && v == jw(b, a) &&
        (a.isEmpty || jw(a, a) == 1.0)
    })
  }

  test("codegen path returns the same values as the kernel") {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("CA", "ABC"), ("red widget", "red wodget"), ("", "x"))
    val df = pairs.toDF("a", "b")
      .select(
        GraftFunctions.jaroWinkler(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")).as("jw"),
        GraftFunctions.damerauLev(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")).as("dl"))
    val got = df.collect().map(r => (r.getDouble(0), r.getLong(1)))
    val want = pairs.map { case (a, b) => (jw(a, b), dl(a, b)) }
    assert(got.toSeq == want)
  }
}
