package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage
import graft.operators.Linkage.FsField
import graft.testkit.SparkTestKit._

/** Fellegi–Sunter scoring contracts: hand-computed log weights, the
  * NULL-is-no-evidence rule, the rounded-score threshold, and the loud
  * validation surface. (q229 checks the full blocked pipeline against
  * DuckDB; this pins the arithmetic on hand cases.) */
class LinkageSpec extends AnyFunSuite {

  private val fields = Seq(
    FsField("seg", 0.9, 0.2), FsField("name", 0.99, 0.001))
  private def r6(v: Double) = BigDecimal(v)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fellegiSunterScores: hand-computed weights, NULL no-evidence, threshold") {
    val left = table("lid bigint, seg string, name string", Seq(
      row(1L, "A", "alice"), row(2L, "B", "bob"), row(3L, null, "carol")))
    val right = table("rid bigint, seg string, name string", Seq(
      row(10L, "A", "alice"),   // full agree with 1
      row(20L, "B", "robert"),  // seg agrees w/ 2, name disagrees
      row(30L, "C", "carol")))  // name agrees w/ 3, seg NULL on left
    val cands = table("id_a bigint, id_b bigint", Seq(
      row(1L, 10L), row(2L, 20L), row(3L, 30L)))
    val got = Linkage.fellegiSunterScores(cands, "id_a", "id_b",
        left, "lid", right, "rid", fields, matchThreshold = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
    val wSeg = math.log(0.9 / 0.2)
    val wSegNo = math.log((1.0 - 0.9) / (1.0 - 0.2))
    val wName = math.log(0.99 / 0.001)
    val wNameNo = math.log((1.0 - 0.99) / (1.0 - 0.001))
    assert(got(0) == ((1L, 10L, 2L, r6(wSeg + wName), true)), got(0).toString)
    assert(got(1) == ((2L, 20L, 1L, r6(wSeg + wNameNo), false)), got(1).toString)
    // NULL seg on the left: no evidence either way, only name scores
    assert(got(2) == ((3L, 30L, 1L, r6(wName), true)), got(2).toString)
  }

  test("fellegiSunterScores: loud validation") {
    val df = table("lid bigint, seg string", Seq(row(1L, "A")))
    val cands = table("id_a bigint, id_b bigint", Seq(row(1L, 1L)))
    intercept[IllegalArgumentException] { FsField("seg", 0.2, 0.9) }
    intercept[IllegalArgumentException] { FsField("seg", 1.0, 0.5) }
    intercept[IllegalArgumentException] { FsField("seg", 0.5, 0.0) }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunterScores(cands, "id_a", "id_b", df, "lid", df, "lid",
        Nil, 0.0)
    }
    intercept[IllegalArgumentException] { // field absent from a frame
      Linkage.fellegiSunterScores(cands, "id_a", "id_b", df, "lid", df, "lid",
        Seq(FsField("missing", 0.9, 0.1)), 0.0)
    }
    intercept[IllegalArgumentException] { // duplicate fields
      Linkage.fellegiSunterScores(cands, "id_a", "id_b", df, "lid", df, "lid",
        Seq(FsField("seg", 0.9, 0.1), FsField("seg", 0.8, 0.2)), 0.0)
    }
  }
}
