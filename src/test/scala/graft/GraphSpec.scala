package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph
import graft.testkit.SparkTestKit._

/** [[Graph.pageRank]] contracts: hand-computed ranks, the
  * regular-graph fixed point, and mass conservation. */
class GraphSpec extends AnyFunSuite {

  private def sym(pairs: (Long, Long)*) =
    table("a bigint, b bigint",
      pairs.flatMap { case (x, y) => Seq(row(x, y), row(y, x)) })

  test("pageRank: path graph 1-2-3 after one iteration matches hand arithmetic") {
    val ranks = Graph.pageRank(sym((1L, 2L), (2L, 3L)), "a", "b", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // n=3, teleport 0.05; ends receive r0(2)/2, the middle both ends
    assert(math.abs(ranks(1L) - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(ranks(2L) - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(math.abs(ranks(3L) - (0.05 + 0.85 / 6)) < 1e-12)
  }

  test("pageRank: a regular graph stays at the uniform fixed point; mass is conserved") {
    // triangle: every node degree 2 — uniform 1/3 is stationary
    val ranks = Graph.pageRank(sym((1L, 2L), (2L, 3L), (1L, 3L)), "a", "b",
      iterations = 3).collect().map(_.getDouble(1))
    ranks.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-12, ranks.toSeq))
    assert(math.abs(ranks.sum - 1.0) < 1e-12)
  }
}
