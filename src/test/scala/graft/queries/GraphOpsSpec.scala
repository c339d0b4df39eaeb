package graft.queries

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  private val dir = sf("lineitem")

  test("pagerank: positive ranks, mass bounded, uniform-start deviation is real") {
    val out = GraphOps.defs("q_pagerank").run(spark, dir).collect()
    assert(out.nonEmpty)
    val ranks = out.map(_.getDouble(1))
    assert(ranks.forall(r => r > 0.0 && r < 1.0))
    // Without dangling-mass redistribution total mass stays ≤ 1 and
    // above the pure-teleport floor.
    val total = ranks.sum
    assert(total <= 1.0 + 1e-6, s"mass $total exceeds 1")
    assert(total >= 0.15 - 1e-6, s"mass $total below teleport floor")
    // Three iterations over a non-uniform trade matrix must separate
    // the ranks — a constant vector would mean the iteration is a no-op.
    assert(ranks.max - ranks.min > 1e-4, "ranks did not separate from uniform")
  }
}
