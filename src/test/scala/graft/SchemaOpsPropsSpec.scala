package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.types.SchemaOps

/** ScalaCheck properties for the coercion lattice — the reference only
  * spot-checks widening on a handful of cases
  * (`/root/reference/tests/pyspark/test_concat.py:435-458`); these
  * verify the algebra for the whole coercible type universe
  * (lattice numerics + string, with columns allowed to be missing).
  */
class SchemaOpsPropsSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val coercible: Gen[DataType] =
    Gen.oneOf(SchemaOps.NumericPrecedence :+ StringType)

  private val colNames = Seq("a", "b", "c", "d")

  /** A schema over a random subset (never empty) of four columns. */
  private val genSchema: Gen[StructType] = for {
    picked <- Gen.someOf(colNames).suchThat(_.nonEmpty)
    types <- Gen.listOfN(picked.size, coercible)
  } yield StructType(picked.toSeq.zip(types).map {
    case (n, t) => StructField(n, t)
  })

  private val genSchemas: Gen[List[StructType]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, genSchema))

  private def typeMap(s: StructType): Map[String, DataType] =
    s.fields.map(f => f.name -> f.dataType).toMap

  test("schemaDrift: added/removed/retyped/renulled hand-computed; identity is empty") {
    import graft.types.SchemaOps.SchemaChange
    val prev = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("gone", StringType),
      StructField("widened", IntegerType),
      StructField("loosened", DoubleType, nullable = false),
      StructField("same", StringType)))
    val next = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("widened", LongType),
      StructField("loosened", DoubleType, nullable = true),
      StructField("same", StringType),
      StructField("fresh", DateType)))
    val got = SchemaOps.schemaDrift(prev, next)
    assert(got == Seq(
      SchemaChange("fresh", "added", "", "DATE"),
      SchemaChange("gone", "removed", "STRING", ""),
      SchemaChange("loosened", "nullability_changed",
        "DOUBLE NOT NULL", "DOUBLE"),
      SchemaChange("widened", "type_changed", "INT", "BIGINT")), got.toString)
    assert(SchemaOps.schemaDrift(prev, prev).isEmpty)
    // drift is anti-symmetric on add/remove and symmetric on the rest
    val back = SchemaOps.schemaDrift(next, prev)
    assert(back.exists(c => c.column == "fresh" && c.change == "removed"))
    assert(back.exists(c => c.column == "gone" && c.change == "added"))
    assert(back.exists(c => c.column == "widened" && c.change == "type_changed"))
  }

  test("largestNumericType is permutation-invariant and a semilattice join") {
    val nums = Gen.nonEmptyListOf(Gen.oneOf(SchemaOps.NumericPrecedence))
    check("commutative", Prop.forAll(nums) { xs =>
      SchemaOps.largestNumericType(xs) ==
        SchemaOps.largestNumericType(xs.reverse)
    })
    check("associative-split", Prop.forAll(nums, nums) { (xs, ys) =>
      SchemaOps.largestNumericType(xs ++ ys) ==
        SchemaOps.largestNumericType(Seq(
          SchemaOps.largestNumericType(xs), SchemaOps.largestNumericType(ys)))
    })
    check("idempotent", Prop.forAll(Gen.oneOf(SchemaOps.NumericPrecedence)) {
      t => SchemaOps.largestNumericType(Seq(t, t)) == t
    })
  }

  test("analyze resolved types are input-order independent (test_concat.py:435-458 generalized)") {
    check("permutation", Prop.forAll(genSchemas) { schemas =>
      typeMap(SchemaOps.analyze(schemas).finalSchema) ==
        typeMap(SchemaOps.analyze(schemas.reverse).finalSchema)
    })
  }

  test("analyze: string wins wherever any input has the column as string") {
    check("string-wins", Prop.forAll(genSchemas) { schemas =>
      val resolved = typeMap(SchemaOps.analyze(schemas).finalSchema)
      colNames.forall { n =>
        val present = schemas.flatMap(_.fields.find(_.name == n)).map(_.dataType)
        !present.contains(StringType) || resolved(n) == StringType
      }
    })
  }

  test("analyze: numeric result is at least as wide as every input type") {
    check("monotone", Prop.forAll(genSchemas) { schemas =>
      val resolved = typeMap(SchemaOps.analyze(schemas).finalSchema)
      schemas.forall(_.fields.forall { f =>
        resolved(f.name) == StringType || {
          val idx = SchemaOps.NumericPrecedence.indexOf(resolved(f.name))
          idx >= 0 && idx <= SchemaOps.NumericPrecedence.indexOf(f.dataType)
        }
      })
    })
  }

  test("analyze is idempotent: re-analyzing the result is a fixpoint") {
    check("fixpoint", Prop.forAll(genSchemas) { schemas =>
      val first = SchemaOps.analyze(schemas).finalSchema
      typeMap(SchemaOps.analyze(Seq(first, first)).finalSchema) == typeMap(first)
    })
  }

  test("compatibility: lattice-consistent widening, never a silent narrow") {
    val lattice = SchemaOps.NumericPrecedence
    // exhaustive over lattice pairs: widening verdicts agree with the
    // lattice's widest-type rule; the reverse direction NEVER passes
    for (r <- lattice; w <- lattice) {
      val v = SchemaOps.compatibility(
        StructType(Seq(StructField("c", r))),
        StructType(Seq(StructField("c", w)))).head.verdict
      val expected =
        if (r == w) "ok"
        else if (SchemaOps.largestNumericType(Seq(r, w)) == r) "ok_widen"
        else "incompatible_type"
      assert(v == expected, s"$w -> $r gave $v, expected $expected")
    }
    // missing columns split on reader nullability; extras are noted
    val got = SchemaOps.compatibility(
      StructType(Seq(
        StructField("opt", StringType, nullable = true),
        StructField("req", StringType, nullable = false))),
      StructType(Seq(StructField("extra", LongType))))
    assert(got.map(v => v.column -> v.verdict) == Seq(
      "extra" -> "ignored_extra", "opt" -> "ok_null_fill",
      "req" -> "missing_required"), got.toString)
    // non-lattice decimals stay strict: only decimal(10,0) widens
    val dec = SchemaOps.compatibility(
      StructType(Seq(StructField("c", DecimalType(12, 2)))),
      StructType(Seq(StructField("c", IntegerType)))).head
    assert(dec.verdict == "incompatible_type", dec.toString)
  }
}
