package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile
import graft.testkit.SparkTestKit._

class ProfileSpec extends AnyFunSuite {

  private def frame = table("id bigint, lang string, score int", Seq(
    row(1L, "en", 10),
    row(2L, "en", 10),
    row(3L, "fr", 7),
    row(4L, null, 7),
    row(5L, "de", null),
    row(6L, "en", 3)))

  test("profile: exact null/distinct/min/max per column, one row each") {
    val p = Profile.profile(frame, Seq("id", "lang", "score"),
      exactDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((6L, 0L, 6L, "1", "6")))
    assert(p("lang") == ((6L, 1L, 3L, "de", "fr")))
    assert(p("score") == ((6L, 1L, 3L, "3", "10")))
  }

  test("profile: HLL path matches exact cardinalities on small frames") {
    // rsd 0.01 is exact-by-construction at these cardinalities; the
    // point is that the default path shares every other statistic.
    val p = Profile.profile(frame, Seq("id", "lang"), rsd = 0.01)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((0L, 6L)))
    assert(p("lang") == ((1L, 3L)))
  }

  test("profile: unknown column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(frame, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("topValues: top-k by count, ties break by value asc, nulls dropped") {
    val top = Profile.topValues(frame, Seq("lang", "score"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, rs) => c -> rs.map(t => (t._2, t._3)).toSeq }
    // lang: en x3, then de/fr tie at 1 -> "de" wins lexicographically
    assert(top("lang") == Seq(("en", 3L), ("de", 1L)))
    // score: 10 x2 and 7 x2 tie at 2 -> "10" < "7" lexicographically
    assert(top("score") == Seq(("10", 2L), ("7", 2L)))
  }
}
