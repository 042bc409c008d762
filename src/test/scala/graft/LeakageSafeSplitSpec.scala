package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus
import graft.testkit.SparkTestKit._

/** Cluster-aware train/val splitting (SURVEY.md §2.8). */
class LeakageSafeSplitSpec extends AnyFunSuite {

  test("leakageSafeSplit: cluster members share a split, singletons self-represent") {
    val docs = table("id bigint", (1L to 8L).map(row(_)))
    // clusters: {1,2,3} (chained), {5,6}; 4,7,8 singletons
    val pairs = table("id_a bigint, id_b bigint", Seq(
      row(1L, 2L), row(2L, 3L), row(5L, 6L)))
    val out = Corpus.leakageSafeSplit(docs, "id", pairs, "id_a", "id_b", m = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 1L && byId(2L)._2 == 1L && byId(3L)._2 == 1L)
    assert(byId(5L)._2 == 5L && byId(6L)._2 == 5L)
    assert(byId(4L)._2 == 4L && byId(7L)._2 == 7L && byId(8L)._2 == 8L)
    // the leakage guarantee: same rep -> same split
    assert(byId(1L)._3 == byId(2L)._3 && byId(2L)._3 == byId(3L)._3)
    assert(byId(5L)._3 == byId(6L)._3)
    out.foreach { case (_, _, s) => assert(s >= 0 && s < 4) }
  }
}
