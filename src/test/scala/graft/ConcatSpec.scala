package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Concat
import graft.types.{SchemaCoercionException, SchemaOps}
import graft.testkit.SparkTestKit._

/** Ports the reference's concat golden tables
  * (`/root/reference/tests/pyspark/test_concat.py`) to ScalaTest. */
class ConcatSpec extends AnyFunSuite {

  private def frenchCheese = table(
    "name string, crumbliness bigint, maturity bigint, tang bigint, creaminess bigint",
    Seq(row("brie", 10L, 85L, 20L, 95L), row("camembert", 15L, 80L, 25L, 90L)))
  private def greekCheese = table(
    "name string, crumbliness bigint, maturity bigint, tang bigint, creaminess bigint",
    Seq(row("feta", 90L, 35L, 60L, 30L)))
  private def britishCheese = table(
    "name string, crumbliness bigint, maturity bigint, tang bigint, creaminess bigint",
    Seq(row("cheddar", 80L, 80L, 80L, 4L), row("caerphilly", 85L, 50L, 35L, 20L)))
  private def italianCheese = table(
    "name string, creaminess bigint, saltiness bigint",
    Seq(row("mozzarella", 95L, 10L), row("pecorino", 5L, 90L)))

  test("same-schema union, no keys (test_concat.py:62-80)") {
    val out = Concat.concat(Seq(frenchCheese, greekCheese, britishCheese))
    val expected = table(
      "name string, crumbliness bigint, maturity bigint, tang bigint, creaminess bigint",
      Seq(
        row("brie", 10L, 85L, 20L, 95L), row("camembert", 15L, 80L, 25L, 90L),
        row("feta", 90L, 35L, 60L, 30L),
        row("cheddar", 80L, 80L, 80L, 4L), row("caerphilly", 85L, 50L, 35L, 20L)))
    assertDfEquality(out, expected)
  }

  test("single-part keys become a leading literal column (test_concat.py:82-110)") {
    val out = Concat.concat(
      Seq(frenchCheese, greekCheese), Seq("french", "greek"), "country")
    val expected = table(
      "country string, name string, crumbliness bigint, maturity bigint, tang bigint, creaminess bigint",
      Seq(
        row("french", "brie", 10L, 85L, 20L, 95L),
        row("french", "camembert", 15L, 80L, 25L, 90L),
        row("greek", "feta", 90L, 35L, 60L, 30L)))
    assertDfEquality(out, expected)
  }

  test("multi-part keys become multiple leading columns (test_concat.py:111-134)") {
    val out = Concat.concat(
      Seq(frenchCheese, greekCheese),
      Seq(Seq("french", "yes"), Seq("greek", "no")),
      Seq("country", "tasted"))
    assert(out.columns.toSeq ==
      Seq("country", "tasted", "name", "crumbliness", "maturity", "tang", "creaminess"))
    assert(out.filter(out("country") === "greek").count() == 1)
  }

  test("Map input uses insertion-order keys (test_concat.py:82-110)") {
    val out = Concat.concat(
      ListMap[Seq[Any], org.apache.spark.sql.DataFrame](
        Seq("british") -> britishCheese, Seq("italian") -> italianCheese),
      Seq("country"))
    assert(out.select("country").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("british", "italian"))
  }

  test("divergent columns null-fill; order = first frame then new (test_concat.py:135-147)") {
    val out = Concat.concat(
      Seq(britishCheese, italianCheese), Seq("british", "italian"), "country")
    assert(out.columns.toSeq == Seq(
      "country", "name", "crumbliness", "maturity", "tang", "creaminess", "saltiness"))
    val expected = table(
      "country string, name string, crumbliness bigint, maturity bigint, tang bigint, creaminess bigint, saltiness bigint",
      Seq(
        row("british", "cheddar", 80L, 80L, 80L, 4L, null),
        row("british", "caerphilly", 85L, 50L, 35L, 20L, null),
        row("italian", "mozzarella", null, null, null, 95L, 10L),
        row("italian", "pecorino", null, null, null, 5L, 90L)))
    assertDfEquality(out, expected)
  }

  test("numeric widening long+double -> double (test_concat.py:189-226)") {
    val d1 = table("breed string, weight bigint", Seq(row("corgi", 10L)))
    val d2 = table("breed string, weight double", Seq(row("lab", 25.5)))
    val out = Concat.concat(Seq(d1, d2))
    assert(out.schema("weight").dataType == DoubleType)
    assertDfEquality(out, table("breed string, weight double",
      Seq(row("corgi", 10.0), row("lab", 25.5))))
  }

  test("string coercion wins over numeric (test_concat.py:228-264)") {
    val s1 = table("store_type string, branch string",
      Seq(row("1", "outlet"), row("2", "high street")))
    val s2 = table("store_type bigint, branch string",
      Seq(row(3L, "outlet"), row(4L, "high street")))
    val s3 = table("store_type bigint, branch double", Seq(row(5L, 3.2)))
    val out = Concat.concat(Seq(s1, s2, s3))
    assert(out.schema("store_type").dataType == StringType)
    assert(out.schema("branch").dataType == StringType)
    assertDfEquality(out, table("store_type string, branch string",
      Seq(row("1", "outlet"), row("2", "high street"),
        row("3", "outlet"), row("4", "high street"), row("5", "3.2"))))
  }

  test("combined missing-column + mixed types (test_concat.py:294-332)") {
    val u1 = table("unit string, speed bigint", Seq(row("knight", 10L)))
    val u2 = table("unit string, speed double, attack bigint", Seq(row("archer", 12.5, 3L)))
    val u3 = table("unit string, attack string", Seq(row("mage", "high")))
    val out = Concat.concat(Seq(u1, u2, u3))
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq == Seq(
      ("unit", StringType), ("speed", DoubleType), ("attack", StringType)))
  }

  test("uncoercible timestamp vs boolean raises (test_concat.py:399-413)") {
    val t1 = table("id bigint, flag timestamp",
      Seq(row(1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))))
    val t2 = table("id bigint, flag boolean", Seq(row(1L, true)))
    intercept[SchemaCoercionException] { Concat.concat(Seq(t1, t2)) }
  }

  test("missing non-numeric non-string column raises (concat.py:234-238)") {
    val t1 = table("id bigint", Seq(row(1L)))
    val t2 = table("id bigint, ts timestamp",
      Seq(row(1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))))
    intercept[SchemaCoercionException] { Concat.concat(Seq(t1, t2)) }
  }

  test("dtype drift yields UnequalSchemaWarning diagnostic (test_concat.py:415-432)") {
    val a = table("id bigint, v string", Seq(row(1L, "x")))
    val b = table("id string, v string", Seq(row("2", "y")))
    val (_, analysis) = Concat.concatWithDiagnostics(Seq(a, b), Nil, Nil)
    assert(analysis.warning.isDefined)
    assert(analysis.warning.get.columns.map(_.name) == Seq("id"))
    assert(!analysis.schemasEqual)
  }

  test("missing-column-only drift coerces silently (concat.py:277-287)") {
    val a = table("id bigint, v bigint", Seq(row(1L, 2L)))
    val b = table("id bigint", Seq(row(3L)))
    val (_, analysis) = Concat.concatWithDiagnostics(Seq(a, b), Nil, Nil)
    assert(analysis.warning.isEmpty)
    assert(!analysis.schemasEqual)
  }

  test("empty input raises (test_concat.py:334-343)") {
    intercept[IllegalArgumentException] { Concat.concat(Seq.empty) }
  }

  test("key arity violations raise (test_concat.py:344-397)") {
    intercept[IllegalArgumentException] {
      Concat.concat(Seq(frenchCheese, greekCheese), Seq("only-one"), "country")
    }
    intercept[IllegalArgumentException] {
      Concat.concat(Seq(frenchCheese), Seq(Seq("a", "b")), Seq("country"))
    }
    intercept[IllegalArgumentException] {
      Concat.concat(Seq(frenchCheese, greekCheese),
        Seq(Seq("a", "b"), Seq("c")), Seq("x", "y"))
    }
  }

  test("lattice unit cases (test_concat.py:435-458)") {
    import SchemaOps.largestNumericType
    assert(largestNumericType(Seq(DoubleType, DoubleType, DecimalType(10, 0))) ==
      DecimalType(10, 0))
    assert(largestNumericType(Seq(FloatType, LongType)) == FloatType)
    assert(largestNumericType(Seq(ByteType, ShortType, IntegerType)) == IntegerType)
    assert(largestNumericType(Seq(LongType, IntegerType)) == LongType)
  }

  test("missing column defaults to int for eligibility, not widening (concat.py:224-231)") {
    // Column present only as smallint; missing elsewhere -> final smallint.
    val a = table("id bigint, v smallint", Seq(row(1L, 2.toShort)))
    val b = table("id bigint", Seq(row(3L)))
    val out = Concat.concat(Seq(a, b))
    assert(out.schema("v").dataType == ShortType)
  }
}
