package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r15 scale-adaptive semdedup bucketing (SemDedupOps):
  *   1. the planesFor depth table, including exact integer boundaries
  *      (the GeoOps.cellDepth discipline — a float log rule could flip
  *      a whole corpus's buckets by one ulp at a boundary count);
  *   2. non-degeneracy of the parity plane family (i ≥ 6): each plane
  *      splits the dimension range and no two planes coincide — the
  *      bit-of-dimension family is exhausted at 6 planes on 64 dims;
  *   3. the 5th plane actually engages above the 16k-distinct
  *      threshold, spreading buckets past the fixed-16 ceiling.
  */
class SemDedupSpec extends SparkSpec {

  test("planesFor depth table with exact boundaries") {
    import spark.implicits._
    val expected = Seq(
      1L -> 4, 15999L -> 4, 16000L -> 5, 31999L -> 5,
      32000L -> 6, 63999L -> 6, 64000L -> 7, 128000L -> 8,
      256000L -> 9, 512000L -> 10, 1024000L -> 11,
      2048000L -> 12, 4096000L -> 12, 1000000000L -> 12)
    val got = expected.map(_._1).toDF("n")
      .select(col("n"), SemDedupOps.planesFor(col("n")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    expected.foreach { case (n, p) =>
      assert(got(n) == p, s"planesFor($n) = ${got(n)}, expected $p")
    }
  }

  test("parity planes (i >= 6) split the dimension range and are pairwise distinct") {
    import spark.implicits._
    val dims = (0 until 64).toDF("pos")
    val signs = (0 until 12).map { i =>
      i -> dims.select(SemDedupOps.planeWeight(i, col("pos")).as("w"))
        .collect().map(_.getInt(0)).toVector
    }
    signs.foreach { case (i, w) =>
      assert(w.forall(x => x == 1 || x == -1), s"plane $i produced a non-±1 weight")
      // Plane 6+ must not be constant (the all-ones degeneracy the
      // bit family hits past 6 planes on 64 dims).
      if (i >= 6) assert(w.distinct.size == 2, s"plane $i is constant: ${w.take(8)}")
    }
    // No two planes share a sign pattern (or its negation — that would
    // make the pair redundant for bucketing).
    for (Seq((i, wi), (j, wj)) <- signs.combinations(2)) {
      assert(wi != wj && wi != wj.map(-_), s"planes $i and $j coincide")
    }
  }

  test("5th plane engages above the 16k-distinct threshold") {
    import spark.implicits._
    // 17k distinct 64-dim vectors (full width, so all 6 bit-family
    // planes are live). The first 4 dims are the base-17 digits of the
    // id — guaranteeing pairwise-distinct vectors — and the rest is
    // deterministic integer mixing.
    val n = 17000
    val e = spark.sparkContext.parallelize(0 until n, 8)
      .map { id =>
        val v = (0 until 64).map { d =>
          if (d < 4) ((id / math.pow(17, d).toInt) % 17 - 8).toDouble
          else (((id * (d * d + 3) + id / 17 * (d + 5) + 7 * d) % 17) - 8).toDouble
        }.toArray
        (id.toLong, v)
      }
      .toDF("vec_id", "v")
    val nd = e.agg(count(lit(1)).as("nv"))
    val buckets = SemDedupOps.bucketed(e, nd)
      .select("bucket").distinct().collect().map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < 32), s"bucket out of 5-plane range: ${buckets.max}")
    assert(buckets.length > 16,
      s"only ${buckets.length} buckets used — 5th plane did not engage above 16k distinct")
  }
}
