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

  // ---- kCore -------------------------------------------------------

  /** Textbook sequential peel in plain Scala: remove ANY node below k,
    * one at a time, until none remains — confluence means order cannot
    * matter, so this is a valid reference for the batch peel. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    var alive = und.flatMap { case (a, b) => Seq(a, b) }.toSet
    def deg(v: Long) = und.count { case (a, b) =>
      (a == v && alive(b)) || (b == v && alive(a))
    }
    var changed = true
    while (changed) {
      alive.find(v => deg(v) < k) match {
        case Some(v) => alive -= v
        case None => changed = false
      }
    }
    alive.map(v => v -> deg(v)).toMap
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    Graph.kCore(table("a bigint, b bigint", edges.map(e => row(e._1, e._2))),
        "a", "b", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: clique survives, pendant chain peels, k=2 hand case") {
    // triangle 1-2-3 plus a chain 3-4-5: at k=2 the chain peels away
    // over TWO rounds (5 first, then 4 — a genuinely multi-round peel)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val core = runKCore(edges, 2)
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
    // k=3: the triangle's in-core degree is only 2 — everything peels
    assert(runKCore(edges, 3).isEmpty)
  }

  test("kCore: duplicated, reversed, and self-loop edges canonicalize") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L))
    assert(runKCore(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: agrees with the sequential reference on random graphs") {
    val rnd = new scala.util.Random(11)
    (0 until 4).foreach { trial =>
      val n = 12 + rnd.nextInt(8)
      val edges = Seq.fill(25 + rnd.nextInt(20))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val k = 2 + rnd.nextInt(2)
      val exp = refKCore(edges, k).map { case (v, d) => v -> d.toLong }
      val got = runKCore(edges, k)
      assert(got == exp, s"trial $trial k=$k:\n got $got\n exp $exp")
    }
  }

  test("kCore: a long path needs O(diameter) rounds — maxRounds fails loudly") {
    // path 0-1-...-9 at k=2 peels one node from each end per round and
    // ends EMPTY; with maxRounds=2 the engine must refuse, not return
    // a half-peeled set
    val path = (0L until 9L).map(i => (i, i + 1))
    assert(runKCore(path, 2).isEmpty)
    val err = intercept[IllegalArgumentException] {
      Graph.kCore(table("a bigint, b bigint", path.map(e => row(e._1, e._2))),
        "a", "b", k = 2, maxRounds = 2).collect()
    }
    assert(err.getMessage.contains("converge"), err.getMessage)
  }
}
