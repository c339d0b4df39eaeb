package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Geospatial bucketing and distance analytics over deterministic
  * synthetic coordinates (the schema carries no geography, so both
  * engines derive centi-degree points from the integer keys with the
  * same exact modular arithmetic).
  *
  * Scale posture: the spatial join is keyed by geohash CELL — the
  * spatial analogue of the LSH bucket join (never an all-pairs
  * cross join); nearest-per-customer is a struct-min partial aggregate
  * (bounded map-side state). The geohash itself is the native
  * Geohash6 codegen kernel: one deterministic double quantization,
  * then pure integer bit interleaving that the oracle replicates
  * bit-for-bit.
  */
object GeoOps {

  /** Deterministic centi-degree coordinates from an integer key. */
  private def lat(key: Column, mult: Long): Column =
    (key * mult % 18000L) / 100.0 - 90.0
  private def lon(key: Column, mult: Long): Column =
    (key * mult % 36000L) / 100.0 - 180.0

  private def custPoints(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(
      col("c_custkey"),
      lat(col("c_custkey"), 7919L).as("clat"),
      lon(col("c_custkey"), 104729L).as("clon"))

  private def suppPoints(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "supplier").select(
      col("s_suppkey"),
      lat(col("s_suppkey"), 12553L).as("slat"),
      lon(col("s_suppkey"), 30011L).as("slon"))

  /** Geohash-cell depth for the cell join: one more character (32×
    * more cells) per 32× supplier growth, so per-cell population — and
    * with it the candidate pair count per customer — stays bounded at
    * any corpus size (the 25ji planesFor discipline; the r13 sf10
    * sweep measured the fixed-depth variant at ~4.7B pairs).
    * Integer threshold comparisons (1000·32^k), NOT
    * floor(ln(ns/1000)/ln 32): the float log ratio can differ by an
    * ulp between engines at exact boundary counts (e.g. ns=32000),
    * which would silently flip every cell assignment corpus-wide.
    * Capped at 6 — a geohash6 has six characters.
    * GeoOpsSpec pins the scaling table including the boundaries.
    */
  private[queries] def cellDepth(nSupp: Column): Column =
    (lit(1) +
      when(nSupp >= 32000L, 1).otherwise(0) +
      when(nSupp >= 1024000L, 1).otherwise(0) +
      when(nSupp >= 32768000L, 1).otherwise(0) +
      when(nSupp >= 1048576000L, 1).otherwise(0) +
      when(nSupp >= 33554432000L, 1).otherwise(0)).cast("int")

  /** Haversine great-circle distance in km, one fixed operand order. */
  private def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1) / 2.0
    val dlon = radians(lon2 - lon1) / 2.0
    val h = sin(dlat) * sin(dlat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dlon) * sin(dlon)
    lit(12742.0) * asin(sqrt(h))
  }

  val defs: Map[String, QDef] = Map(

    // §2 25gz native geohash encode, bit-for-bit vs the oracle's
    // integer-fold replication: a 6-char geohash is the Z-order
    // interleave of 15-bit quantized (lon, lat) rendered in base32.
    // The only float ops are the two quantizations (identical IEEE
    // divides + floor on both engines); the fold is shifts and masks.
    "q_geohash_encode" -> QDef(
      (s, dir) =>
        custPoints(s, dir)
          .filter(col("c_custkey") <= 100)
          .select(col("c_custkey"),
            round(col("clat"), 2).as("lat"),
            round(col("clon"), 2).as("lon"),
            GraftFunctions.geohash6(col("clat"), col("clon")).as("cell"))
          .orderBy("c_custkey"),
      """WITH c AS (
        |  SELECT c_custkey,
        |    (c_custkey * 7919 % 18000) / 100.0 - 90.0 AS lat,
        |    (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon
        |  FROM customer WHERE c_custkey <= 100),
        |q AS (
        |  SELECT c_custkey, lat, lon,
        |    GREATEST(0, LEAST(32767,
        |      CAST(FLOOR((lat + 90.0) / 180.0 * 32768.0) AS BIGINT))) AS latq,
        |    GREATEST(0, LEAST(32767,
        |      CAST(FLOOR((lon + 180.0) / 360.0 * 32768.0) AS BIGINT))) AS lonq
        |  FROM c),
        |wcode AS (
        |  SELECT c_custkey, lat, lon,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 15)),
        |      (acc, i) -> acc
        |        + ((lonq >> CAST(14 - i AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(29 - 2 * i AS INT))
        |        + ((latq >> CAST(14 - i AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(28 - 2 * i AS INT)))
        |      AS code
        |  FROM q)
        |SELECT c_custkey, ROUND(lat, 2) AS lat, ROUND(lon, 2) AS lon,
        |  array_to_string(list_transform(range(0, 6),
        |    j -> substr('0123456789bcdefghjkmnpqrstuvwxyz',
        |                CAST((code >> CAST(25 - 5 * j AS INT)) & 31 AS INT) + 1, 1)), '')
        |    AS cell
        |FROM wcode ORDER BY c_custkey""".stripMargin),

    // §2 25ha geohash-cell nearest-supplier join: customers and
    // suppliers bucket into geohash cells and join ONLY within a cell —
    // the spatial analogue of the LSH-bucket join. Cell DEPTH SCALES
    // with the supplier count (one more geohash char per 32× growth,
    // the 25ji planesFor discipline): a FIXED 32-cell grid makes the
    // candidate pair count O(n_cust·n_supp/32) — quadratic under
    // uniform scale-up; the r13 full-inventory sf10 sweep measured it
    // as ~4.7 BILLION pairs grinding a single straggler partition.
    // With depth = 1 + ⌊log32(n_supp/1000)⌋ the per-cell supplier
    // population is bounded, so pairs stay linear in the customer
    // count; gate scales keep depth 1, so sub-sf1 results are
    // unchanged. The supplier side is dimension-scale and is
    // broadcast EXPLICITLY — at sf10 its ~100k rows silently crossed
    // the auto-broadcast threshold into a sort-merge join on a
    // 32-value key (the second half of the same sweep finding).
    // Nearest supplier per customer is a struct-min PARTIAL aggregate
    // (map-side state is one pair per customer); output is the global
    // 20 closest pairs. Like every grid ANN, cross-cell-boundary
    // neighbors are excluded by construction — the oracle applies the
    // identical depth rule and cell construction bit-for-bit.
    "q_geo_cell_join" -> QDef(
      (s, dir) => {
        val ns = Tables(s, dir, "supplier").agg(count(lit(1)).as("ns"))
        val depth = cellDepth(col("ns"))
        val cust = custPoints(s, dir).crossJoin(broadcast(ns))
          .withColumn("cell",
            GraftFunctions.geohash6(col("clat"), col("clon"))
              .substr(lit(1), depth))
          .drop("ns")
        val supp = suppPoints(s, dir).crossJoin(broadcast(ns))
          .withColumn("cell",
            GraftFunctions.geohash6(col("slat"), col("slon"))
              .substr(lit(1), depth))
          .drop("ns")
        // Rank on dist rounded to 6 dp (like every ANN path here):
        // sin/cos/asin can differ from the oracle's libm by ulps, and an
        // unrounded near-tie could flip the per-customer argmin or the
        // global top-20 cut on one engine only.
        cust.join(broadcast(supp), "cell")
          .withColumn("dist",
            round(haversineKm(col("clat"), col("clon"), col("slat"), col("slon")), 6))
          .groupBy("c_custkey")
          .agg(min(struct(col("dist"), col("s_suppkey"))).as("m"))
          .select(col("c_custkey"),
            col("m.s_suppkey").as("s_suppkey"),
            col("m.dist").as("dist"))
          .orderBy(col("dist").asc, col("c_custkey").asc)
          .limit(20)
          .select(col("c_custkey"), col("s_suppkey"),
            round(col("dist"), 3).as("dist_km"))
      },
      """WITH nsup AS (
        |  SELECT 1 + CAST(COUNT(*) >= 32000 AS INT)
        |       + CAST(COUNT(*) >= 1024000 AS INT)
        |       + CAST(COUNT(*) >= 32768000 AS INT)
        |       + CAST(COUNT(*) >= 1048576000 AS INT)
        |       + CAST(COUNT(*) >= 33554432000 AS INT) AS depth
        |  FROM supplier),
        |cust AS (
        |  SELECT c_custkey,
        |    (c_custkey * 7919 % 18000) / 100.0 - 90.0 AS clat,
        |    (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS clon
        |  FROM customer),
        |supp AS (
        |  SELECT s_suppkey,
        |    (s_suppkey * 12553 % 18000) / 100.0 - 90.0 AS slat,
        |    (s_suppkey * 30011 % 36000) / 100.0 - 180.0 AS slon
        |  FROM supplier),
        |cq AS (
        |  SELECT c_custkey, clat, clon,
        |    GREATEST(0, LEAST(32767,
        |      CAST(FLOOR((clat + 90.0) / 180.0 * 32768.0) AS BIGINT))) AS latq,
        |    GREATEST(0, LEAST(32767,
        |      CAST(FLOOR((clon + 180.0) / 360.0 * 32768.0) AS BIGINT))) AS lonq
        |  FROM cust),
        |ccode AS (
        |  SELECT c_custkey, clat, clon,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 15)),
        |      (acc, i) -> acc
        |        + ((lonq >> CAST(14 - i AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(29 - 2 * i AS INT))
        |        + ((latq >> CAST(14 - i AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(28 - 2 * i AS INT)))
        |      AS code
        |  FROM cq),
        |cc AS (
        |  SELECT c_custkey, clat, clon,
        |    array_to_string(list_transform(range(0, depth),
        |      j -> substr('0123456789bcdefghjkmnpqrstuvwxyz',
        |                  CAST((code >> CAST(25 - 5 * j AS INT)) & 31 AS INT) + 1, 1)), '')
        |      AS cell
        |  FROM ccode CROSS JOIN nsup),
        |sq AS (
        |  SELECT s_suppkey, slat, slon,
        |    GREATEST(0, LEAST(32767,
        |      CAST(FLOOR((slat + 90.0) / 180.0 * 32768.0) AS BIGINT))) AS latq,
        |    GREATEST(0, LEAST(32767,
        |      CAST(FLOOR((slon + 180.0) / 360.0 * 32768.0) AS BIGINT))) AS lonq
        |  FROM supp),
        |scode AS (
        |  SELECT s_suppkey, slat, slon,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 15)),
        |      (acc, i) -> acc
        |        + ((lonq >> CAST(14 - i AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(29 - 2 * i AS INT))
        |        + ((latq >> CAST(14 - i AS INT)) & 1) * (CAST(1 AS BIGINT) << CAST(28 - 2 * i AS INT)))
        |      AS code
        |  FROM sq),
        |sc AS (
        |  SELECT s_suppkey, slat, slon,
        |    array_to_string(list_transform(range(0, depth),
        |      j -> substr('0123456789bcdefghjkmnpqrstuvwxyz',
        |                  CAST((code >> CAST(25 - 5 * j AS INT)) & 31 AS INT) + 1, 1)), '')
        |      AS cell
        |  FROM scode CROSS JOIN nsup),
        |pairs AS (
        |  SELECT c_custkey, s_suppkey,
        |    ROUND(12742.0 * ASIN(SQRT(
        |      SIN(RADIANS(slat - clat) / 2.0) * SIN(RADIANS(slat - clat) / 2.0)
        |      + COS(RADIANS(clat)) * COS(RADIANS(slat))
        |        * SIN(RADIANS(slon - clon) / 2.0) * SIN(RADIANS(slon - clon) / 2.0))), 6)
        |      AS dist
        |  FROM cc JOIN sc USING (cell)),
        |nearest AS (
        |  SELECT c_custkey, s_suppkey, dist,
        |    ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY dist, s_suppkey) AS rk
        |  FROM pairs)
        |SELECT c_custkey, s_suppkey, ROUND(dist, 3) AS dist_km
        |FROM nearest WHERE rk = 1
        |ORDER BY dist ASC, c_custkey ASC LIMIT 20""".stripMargin)
  )
}
