package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GeohashKernel

import graft.SparkSpec

class GeoOpsSpec extends SparkSpec {

  private val dir = sf("customer")

  /** Independent classical geohash: alternating bisection, no shared
    * code with the kernel's quantize-then-interleave formulation.
    */
  private def classic(lat: Double, lon: Double): String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    var latlo = -90.0; var lathi = 90.0; var lonlo = -180.0; var lonhi = 180.0
    var isLon = true; var bits = 0; var ch = 0
    val sb = new StringBuilder
    while (sb.length < 6) {
      if (isLon) {
        val mid = (lonlo + lonhi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonlo = mid }
        else { ch = ch << 1; lonhi = mid }
      } else {
        val mid = (latlo + lathi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latlo = mid }
        else { ch = ch << 1; lathi = mid }
      }
      isLon = !isLon; bits += 1
      if (bits == 5) { sb.append(alpha(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  test("geohash kernel matches the classical bisection on 4000 fuzzed points") {
    val rnd = new scala.util.Random(42)
    (1 to 4000).foreach { _ =>
      val lat = rnd.nextDouble() * 180.0 - 90.0
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val k = GeohashKernel.encode(lat, lon).toString
      val c = classic(lat, lon)
      assert(k == c, s"kernel $k != classic $c at ($lat, $lon)")
    }
    // Known anchor (public test vector): Jutland ≈ u4pru.
    assert(GeohashKernel.encode(57.64911, 10.40744).toString.startsWith("u4pru"))
  }

  test("geohash kernel is total: out-of-domain inputs clamp to edge cells") {
    assert(GeohashKernel.encode(-500.0, -500.0).toString ==
      GeohashKernel.encode(-90.0, -180.0).toString)
    assert(GeohashKernel.encode(95.0, 185.0).toString ==
      GeohashKernel.encode(89.999999, 179.999999).toString)
  }

  test("cell depth scales one geohash char per 32x supplier growth") {
    import spark.implicits._
    // The r13 sf10 sweep finding: fixed depth makes the cell join
    // quadratic. Pin the scaling table so a regression to fixed
    // geometry fails here, not at 100x scale.
    val rows = Seq(10L, 100L, 1000L, 10000L, 31999L, 32000L, 100000L,
        1023999L, 1024000L, 32768000L, 1048576000L, 33554432000L,
        999999999999L)
      .toDF("ns").select(col("ns"), GeoOps.cellDepth(col("ns")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows(10L) == 1 && rows(100L) == 1 && rows(1000L) == 1)
    assert(rows(10000L) == 1 && rows(31999L) == 1)
    assert(rows(32000L) == 2, "first 32x boundary — exact (integer " +
      "thresholds, not a float log that could be off by an ulp)")
    assert(rows(100000L) == 2, "the sf10 supplier count")
    assert(rows(1023999L) == 2 && rows(1024000L) == 3)
    assert(rows(32768000L) == 4 && rows(1048576000L) == 5)
    assert(rows(33554432000L) == 6 && rows(999999999999L) == 6,
      "depth caps at 6 — a geohash6 has six characters")
  }

  test("cell join: every reported pair shares a cell and is cell-locally nearest") {
    val out = GeoOps.defs("q_geo_cell_join").run(spark, dir).collect()
    assert(out.nonEmpty)
    // Recompute the cell-local brute force for the reported customers.
    val cust = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        ((col("c_custkey") * 7919L % 18000L) / 100.0 - 90.0).as("clat"),
        ((col("c_custkey") * 104729L % 36000L) / 100.0 - 180.0).as("clon"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val supp = graft.Tables(spark, dir, "supplier")
      .select(col("s_suppkey"),
        ((col("s_suppkey") * 12553L % 18000L) / 100.0 - 90.0).as("slat"),
        ((col("s_suppkey") * 30011L % 36000L) / 100.0 - 180.0).as("slon"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    def cell(lat: Double, lon: Double) = GeohashKernel.encode(lat, lon).toString.take(1)
    def hav(a: (Double, Double), b: (Double, Double)) = {
      val dlat = math.toRadians(b._1 - a._1) / 2; val dlon = math.toRadians(b._2 - a._2) / 2
      val h = math.sin(dlat) * math.sin(dlat) +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) *
          math.sin(dlon) * math.sin(dlon)
      12742.0 * math.asin(math.sqrt(h))
    }
    out.foreach { r =>
      val (ck, sk, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val c = cust(ck)
      val inCell = supp.filter(s => cell(s._2, s._3) == cell(c._1, c._2))
      assert(inCell.exists(_._1 == sk), s"supplier $sk not in customer $ck's cell")
      val best = inCell.map(s => (hav(c, (s._2, s._3)), s._1)).minBy(identity)
      assert(best._2 == sk && math.abs(best._1 - d) < 1e-3,
        s"customer $ck: reported ($sk, $d) vs brute-force $best")
    }
  }
}
