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

  test("pageRank: agrees with a driver-side reference on random symmetric graphs") {
    // same recurrence computed in plain Scala over the same edge list —
    // catches any drift in node-set, degree, or teleport handling on
    // arbitrary topology, not just the hand-built cases above
    def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
      val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
      val nodes = edges.map(_._1).distinct
      val n = nodes.size.toDouble
      var r = nodes.map(_ -> 1.0 / n).toMap
      (1 to iters).foreach { _ =>
        val in = edges.groupBy(_._2)
          .map { case (d, es) => d -> es.map { case (s, _) => r(s) / out(s) }.sum }
        r = nodes.map(v => v -> (0.15 / n + 0.85 * in.getOrElse(v, 0.0))).toMap
      }
      r
    }
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val undirected = (0 until 20)
        .map(_ => (rnd.nextInt(16).toLong, rnd.nextInt(16).toLong))
        .filter { case (a, b) => a != b }.distinct
      val directed = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val got = Graph.pageRank(
          table("a bigint, b bigint", directed.map { case (a, b) => row(a, b) }),
          "a", "b", iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val exp = reference(directed, 3)
      assert(got.keySet == exp.keySet)
      got.foreach { case (v, r) =>
        assert(math.abs(r - exp(v)) < 1e-9, s"node $v: $r vs ${exp(v)}")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
    }
  }

  test("triangleCounts: hand-computed counts and coefficients on K4 minus an edge") {
    // nodes 1-2-3-4, all edges except (1,4): triangles {1,2,3}, {2,3,4}
    val edges = table("a bigint, b bigint", Seq(
      row(1L, 2L), row(1L, 3L), row(2L, 3L), row(2L, 4L), row(3L, 4L),
      // noise the canonicalization must absorb: reversed dup + self-loop
      row(3L, 2L), row(4L, 4L)))
    val got = Graph.triangleCounts(edges, "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 1.0),
      (2L, 3L, 2L, 2.0 / 3),
      (3L, 3L, 2L, 2.0 / 3),
      (4L, 2L, 1L, 1.0)), got.toString)
  }

  test("triangleCounts: degree-1 nodes get cc 0.0 and still appear") {
    val edges = table("a bigint, b bigint", Seq(
      row(1L, 2L), row(2L, 3L), row(1L, 3L), row(3L, 4L)))
    val got = Graph.triangleCounts(edges, "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 1.0 / 3), (4L, 1L, 0L, 0.0)), got.toString)
  }

  test("triangleCounts: agrees with driver-side brute force on random graphs") {
    val rnd = new scala.util.Random(29)
    (1 to 3).foreach { _ =>
      val edges = (0 until 60)
        .map(_ => (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val adj = edges.toSet
      def conn(x: Long, y: Long) =
        adj((math.min(x, y), math.max(x, y)))
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val exp = nodes.map { v =>
        val nb = nodes.filter(u => u != v && conn(u, v))
        val t = nb.combinations(2).count { case Seq(x, y) => conn(x, y) }
        v -> ((nb.size.toLong, t.toLong))
      }.toMap
      val got = Graph.triangleCounts(
          table("a bigint, b bigint", edges.map { case (a, b) => row(a, b) }),
          "a", "b")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == exp, s"got $got\nexp $exp")
    }
  }
}
