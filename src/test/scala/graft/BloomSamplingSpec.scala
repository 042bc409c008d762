package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bloom, General}
import graft.testkit.SparkTestKit._

/** Bloom-pruned join and stratified hash sampling (extension operators,
  * no reference counterpart — SURVEY.md §2.8). */
class BloomSamplingSpec extends AnyFunSuite {

  private def fact = table("k bigint, v bigint",
    (0L until 200L).map(i => row(i % 50L, i)))
  private def dim = table("dk bigint, name string",
    Seq(row(3L, "three"), row(7L, "seven"), row(11L, "eleven")))

  test("bloomPrunedJoin equals the plain join row-for-row") {
    val pruned = Bloom.bloomPrunedJoin(fact, dim, "k", "dk",
      expectedNumItems = 16, fpp = 0.01)
    val plain = fact.join(dim, col("k") === col("dk"))
    assertDfEquality(pruned, plain, ignoreRowOrder = true)
    assert(pruned.count() == 12) // 3 dim keys x 4 fact rows each
  }

  test("bloomPrunedJoin's pre-filter actually prunes the fact side") {
    val bf = dim.stat.bloomFilter("dk", 16, 0.01)
    val kept = fact.collect().count(r => bf.mightContainLong(r.getLong(0)))
    // All 12 true matches pass; with fpp=1% on 50 keys essentially
    // nothing else does. The operator's correctness never depends on
    // this (the join removes false positives), only its efficiency.
    assert(kept >= 12 && kept < 200)
  }

  test("bloomPrunedJoin's probe stays inside whole-stage codegen") {
    val pruned = Bloom.bloomPrunedJoin(fact, dim, "k", "dk",
      expectedNumItems = 16, fpp = 0.01)
    // drive THIS frame's queryExecution to the final adaptive plan —
    // the codegen marks only exist there (count() would execute a
    // different, wrapping queryExecution and leave this one unplanned)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    // the native probe must appear, the UDF must not
    assert(plan.contains("graft_bloom_might_contain"), plan)
    assert(!plan.toLowerCase.contains("udf"), plan)
    // the Filter carrying the probe is codegen'd: the FINAL adaptive
    // plan marks operators inside a WholeStageCodegen span with "*(id)"
    val finalPlan = plan.linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).toSeq
    val probeLines = finalPlan
      .filter(l => l.contains("Filter") && l.contains("graft_bloom_might_contain"))
    assert(probeLines.nonEmpty, s"no bloom probe filter in the final plan:\n$plan")
    assert(probeLines.forall(_.contains("*(")),
      s"bloom probe filter fell out of whole-stage codegen:\n$plan")
  }

  test("bloomPrunedJoin: null fact keys drop, matching the plain inner join") {
    val nf = table("k bigint, v bigint",
      Seq(row(3L, 1L), row(null, 2L), row(9L, 3L)))
    val pruned = Bloom.bloomPrunedJoin(nf, dim, "k", "dk", expectedNumItems = 4)
    val plain = nf.join(dim, col("k") === col("dk"))
    assertDfEquality(pruned, plain, ignoreRowOrder = true)
    assert(pruned.count() == 1)
  }

  test("bloomPrunedJoin supports string keys and rejects others") {
    val sf = table("k string, v bigint", Seq(row("a", 1L), row("b", 2L), row("c", 3L)))
    val sd = table("dk string", Seq(row("b")))
    val out = Bloom.bloomPrunedJoin(sf, sd, "k", "dk", expectedNumItems = 4)
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(2L))
    val bad = table("k double", Seq(row(1.0)))
    intercept[IllegalArgumentException] {
      Bloom.bloomPrunedJoin(bad, sd, "k", "dk", expectedNumItems = 4)
    }
  }

  test("stratifiedHashSample: per-stratum rates, deterministic and nested") {
    val df = table("lang string, id bigint",
      (0L until 400L).map(i => row(if (i % 2 == 0) "en" else "de", i)))
    val half = General.stratifiedHashSample(df, "lang", "id",
      rates = Map("en" -> 1.0, "de" -> 0.5), m = 8)
    val quarter = General.stratifiedHashSample(df, "lang", "id",
      rates = Map("en" -> 1.0, "de" -> 0.25), m = 8)
    val en = half.filter(col("lang") === "en").count()
    assert(en == 200) // rate 1.0 keeps everything
    val deHalf = half.filter(col("lang") === "de").count()
    assert(deHalf > 50 && deHalf < 150) // ~100 expected, hash-binomial
    // Lower rate selects a SUBSET of the higher rate's rows (threshold
    // monotonicity) — the property that makes ablation corpora nest.
    val halfIds = half.filter(col("lang") === "de")
      .select("id").collect().map(_.getLong(0)).toSet
    val quarterIds = quarter.filter(col("lang") === "de")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(quarterIds.subsetOf(halfIds))
    // Unlisted strata default to rate 0.
    val none = General.stratifiedHashSample(df, "lang", "id",
      rates = Map("en" -> 1.0), m = 8)
    assert(none.filter(col("lang") === "de").count() == 0)
    // Determinism across partitionings.
    val repart = General.stratifiedHashSample(df.repartition(7), "lang", "id",
      rates = Map("en" -> 1.0, "de" -> 0.5), m = 8)
    assert(repart.filter(col("lang") === "de")
      .select("id").collect().map(_.getLong(0)).toSet == halfIds)
  }

  test("capPerStratumSample caps non-integral (float) strata correctly") {
    // Regression: the rate CASE chain must compare the stratum on the
    // SAME string representation the count pass derived the keys from.
    // Comparing the raw column routes through implicit coercion to
    // double, where float 0.1f != double 0.1 — the stratum misses its
    // rate, falls to defaultRate 0, and is silently dropped.
    val df = table("bucket float, id bigint",
      (0L until 100L).map(i => row(if (i % 2 == 0) 0.1f else 0.3f, i)))
    val all = General.capPerStratumSample(df, "bucket", "id", cap = 1000)
    assert(all.count() == 100) // cap above every stratum size keeps all
    val capped = General.capPerStratumSample(df, "bucket", "id", cap = 10, m = 8)
    val perStratum = capped.groupBy("bucket").count()
      .collect().map(_.getLong(1))
    assert(perStratum.length == 2 && perStratum.forall(n => n > 0 && n < 50),
      s"expected both float strata downsampled but kept: ${perStratum.toSeq}")
  }

  test("mixtureSample: derived rates hit the budget mixture; unweighted dropped; small groups whole") {
    // groups: a = 100 rows x 10 chars (1000), b = 10 rows x 10 (100),
    // c = 20 rows x 10 (200, NO weight -> dropped entirely)
    val rows = (0L until 100L).map(i => row(i, "a", 10L)) ++
      (100L until 110L).map(i => row(i, "b", 10L)) ++
      (110L until 130L).map(i => row(i, "c", 10L))
    val df = table("id bigint, g string, sz bigint", rows)
    // budget 300: a gets 300*0.5/1000 = 0.15; b gets 300*0.5/100 = 1.5
    // -> capped at 1.0, so b keeps EVERYTHING (10 rows).
    val kept = General.mixtureSample(df, "g", "id", "sz",
      Map("a" -> 0.5, "b" -> 0.5), budget = 300L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "b") == 10, "under-budget group must keep all rows")
    assert(kept.count(_._2 == "c") == 0, "unweighted group must be dropped")
    val aKept = kept.count(_._2 == "a")
    // expected 15 of 100; the hash is fixed, so the realized count is a
    // constant — bound it loosely to stay robust to the exact constant
    assert(aKept > 0 && aKept < 40, s"group a kept $aKept of 100, expected ~15")
    // deterministic: same call, same survivors
    val again = General.mixtureSample(df, "g", "id", "sz",
      Map("a" -> 0.5, "b" -> 0.5), budget = 300L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sorted.toSeq == again.sorted.toSeq)
  }

  test("mixtureSample rejects non-positive budget and bad weights") {
    val df = table("id bigint, g string, sz bigint", Seq(row(1L, "a", 1L)))
    intercept[IllegalArgumentException] {
      General.mixtureSample(df, "g", "id", "sz", Map("a" -> 1.0), budget = 0L)
    }
    intercept[IllegalArgumentException] {
      General.mixtureSample(df, "g", "id", "sz", Map("a" -> -0.1), budget = 10L)
    }
  }

  test("stratifiedHashSample rejects rates outside [0, 1]") {
    val df = table("lang string, id bigint", Seq(row("en", 1L)))
    intercept[IllegalArgumentException] {
      General.stratifiedHashSample(df, "lang", "id", rates = Map("en" -> 1.5))
    }
  }
}
