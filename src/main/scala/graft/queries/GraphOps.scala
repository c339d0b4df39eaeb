package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over relational data: PageRank on the
  * nation-level trade graph (supplier nation → customer nation, edge
  * weight = shipment count — the TPC-H Q7 flow matrix).
  *
  * Scale shape: the edge list aggregates once from the fact join
  * (partial-aggregated to |src×dst| ≤ |nations|² rows); each PageRank
  * iteration joins the rank vector (|nodes| rows — broadcast) against
  * the edges map-only and reduces contributions per destination with a
  * partial agg, so per-iteration shuffle is O(|edges|) never O(facts).
  * The same loop runs unchanged on a billion-edge graph where ranks no
  * longer broadcast — the join degrades to a shuffle join on src, still
  * O(|edges|). Three fixed iterations, damping 0.85; dangling mass is
  * deliberately NOT redistributed (identical formula in the oracle).
  */
object GraphOps {

  /** (src, dst, w): shipment counts between supplier and customer
    * nations — joins are all key-equi and the two nation dims broadcast.
    */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val ord = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
    val supp = Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = Tables(s, dir, "nation").select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("snk"), col("n_name").as("src"))),
        col("s_nationkey") === col("snk"))
      .join(broadcast(nat.select(col("n_nationkey").as("cnk"), col("n_name").as("dst"))),
        col("c_nationkey") === col("cnk"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  val defs: Map[String, QDef] = Map(

    "q_pagerank" -> QDef(
      (s, dir) => {
        val edges = tradeEdges(s, dir)
        // Row-count share of each out-edge; tot is integral so the
        // division is a single exact-rounded double op on both engines.
        val m = edges
          .join(edges.groupBy("src").agg(sum("w").as("tot")), "src")
          .select(col("src"), col("dst"), (col("w") / col("tot").cast("double")).as("share"))
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        val n = nodes.count() // |nations| — bounded scalar, mirrors the oracle's subquery
        var ranks = nodes.select(col("node"), (lit(1.0) / n).as("rank"))
        for (_ <- 1 to 3) {
          val contrib = m.join(broadcast(ranks), col("src") === col("node"))
            .groupBy(col("dst"))
            .agg(sum(col("rank") * col("share")).as("c"))
          ranks = nodes
            .join(contrib, col("node") === col("dst"), "left")
            .select(col("node"),
              (lit(0.15 / n) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("rank"))
        }
        ranks.select(col("node"), round(col("rank"), 4).as("rank")).orderBy("node")
      },
      """WITH edges AS (
        |  SELECT sn.n_name AS src, cn.n_name AS dst, COUNT(*) AS w
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT e.src, e.dst, e.w / CAST(t.tot AS DOUBLE) AS share
        |  FROM edges e JOIN (SELECT src, SUM(w) AS tot FROM edges GROUP BY src) t
        |  USING (src)),
        |nodes AS (SELECT DISTINCT src AS node FROM edges
        |          UNION SELECT DISTINCT dst FROM edges),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1.0e0 / n AS rank FROM nodes, nn),
        |r1 AS (SELECT nodes.node, 0.15e0 / n + 0.85e0 * COALESCE(c.c, 0.0e0) AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN (
        |         SELECT m.dst, SUM(r0.rank * m.share) AS c
        |         FROM m JOIN r0 ON r0.node = m.src GROUP BY m.dst) c
        |       ON c.dst = nodes.node),
        |r2 AS (SELECT nodes.node, 0.15e0 / n + 0.85e0 * COALESCE(c.c, 0.0e0) AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN (
        |         SELECT m.dst, SUM(r1.rank * m.share) AS c
        |         FROM m JOIN r1 ON r1.node = m.src GROUP BY m.dst) c
        |       ON c.dst = nodes.node),
        |r3 AS (SELECT nodes.node, 0.15e0 / n + 0.85e0 * COALESCE(c.c, 0.0e0) AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN (
        |         SELECT m.dst, SUM(r2.rank * m.share) AS c
        |         FROM m JOIN r2 ON r2.node = m.src GROUP BY m.dst) c
        |       ON c.dst = nodes.node)
        |SELECT node, ROUND(rank, 4) AS rank FROM r3 ORDER BY node""".stripMargin)
  )
}
