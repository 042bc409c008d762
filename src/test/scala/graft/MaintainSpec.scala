package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintain
import graft.operators.Maintain.SummarySpec
import graft.testkit.SparkTestKit._

class MaintainSpec extends AnyFunSuite {

  private val spec = SummarySpec(
    sums = Seq("v"), mins = Seq("v"), maxs = Seq("v"))

  private def facts(rows: Seq[(String, java.math.BigDecimal)]) =
    table("k string, v decimal(18,2)",
      rows.map { case (k, v) => row(k, v) })

  private def bd(s: String) = new java.math.BigDecimal(s)

  test("merge: hand-computed fold — overlapping keys combine, new keys appear") {
    val base = Maintain.summarize(
      facts(Seq("a" -> bd("1.00"), "a" -> bd("2.50"), "b" -> bd("4.00"))),
      Seq("k"), spec)
    val delta = Maintain.summarize(
      facts(Seq("a" -> bd("-3.00"), "c" -> bd("7.25"))),
      Seq("k"), spec)
    val got = Maintain.merge(base, delta, Seq("k"), spec)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString,
        r.getDecimal(3).toPlainString, r.getDecimal(4).toPlainString))
      .toSeq
    assert(got == Seq(
      ("a", 3L, "0.50", "-3.00", "2.50"),
      ("b", 1L, "4.00", "4.00", "4.00"),
      ("c", 1L, "7.25", "7.25", "7.25")), got.toString)
  }

  test("merge == full recompute on random shard splits (the algebraic contract)") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 200).map { _ =>
      (s"k${rnd.nextInt(12)}",
        bd((rnd.nextInt(20001) - 10000).toString).movePointLeft(2))
    }
    val (a, b) = rows.splitAt(rnd.nextInt(rows.size))
    val full = Maintain.summarize(facts(rows), Seq("k"), spec)
      .orderBy("k").collect()
    val merged = Maintain.merge(
        Maintain.summarize(facts(a), Seq("k"), spec),
        Maintain.summarize(facts(b), Seq("k"), spec), Seq("k"), spec)
      .orderBy("k").collect()
    assert(full.length == merged.length)
    full.zip(merged).foreach { case (f, m) =>
      assert(f.getString(0) == m.getString(0))
      assert(f.getLong(1) == m.getLong(1))
      // decimal types widen differently (sum-once vs sum-of-sums) but
      // the VALUES must be identical — exact decimal arithmetic
      (2 to 4).foreach { i =>
        assert(f.getDecimal(i).compareTo(m.getDecimal(i)) == 0,
          s"col $i: ${f.getDecimal(i)} vs ${m.getDecimal(i)}")
      }
    }
  }

  test("distinct rollup: sketch merge == recompute register-exact, order-free, within error") {
    // 3 keys x overlapping value ranges, split into random shards: the
    // merged-sketch estimate must equal the recomputed one EXACTLY
    // (register-wise max is associative/commutative/idempotent), in
    // either merge order, and land within the HLL error of exact
    val rnd = new scala.util.Random(31)
    val rows = (0 until 5000).map { _ =>
      (s"k${rnd.nextInt(3)}", rnd.nextInt(1500).toLong)
    }
    val df = table("k string, u bigint", rows.map { case (k, u) => row(k, u) })
    val (ra, rb) = rows.splitAt(1 + rnd.nextInt(rows.size - 1))
    val a = table("k string, u bigint", ra.map { case (k, u) => row(k, u) })
    val b = table("k string, u bigint", rb.map { case (k, u) => row(k, u) })
    def est(s: org.apache.spark.sql.DataFrame) =
      Maintain.distinctEstimate(s, "u").orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val full = est(Maintain.distinctSummarize(df, Seq("k"), "u"))
    val ab = est(Maintain.distinctMerge(
      Maintain.distinctSummarize(a, Seq("k"), "u"),
      Maintain.distinctSummarize(b, Seq("k"), "u"), Seq("k"), "u"))
    val ba = est(Maintain.distinctMerge(
      Maintain.distinctSummarize(b, Seq("k"), "u"),
      Maintain.distinctSummarize(a, Seq("k"), "u"), Seq("k"), "u"))
    assert(ab == full, s"merged $ab != recomputed $full")
    assert(ba == full, "merge order showed through the sketch")
    // estimates within ~2% of exact (lgK=12 standard error ~1.6%)
    val exact = df.groupBy("k").agg(count_distinct(col("u")).as("d"))
      .orderBy("k").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (k, _, d) =>
      assert(math.abs(d - exact(k)) <= math.max(2L, (0.02 * exact(k)).toLong),
        s"$k: estimate $d vs exact ${exact(k)}")
    }
    // missing sketch column fails loudly
    val e = intercept[IllegalArgumentException] {
      Maintain.distinctMerge(
        Maintain.distinctSummarize(a, Seq("k"), "u").drop("u_hll"),
        Maintain.distinctSummarize(b, Seq("k"), "u"), Seq("k"), "u")
    }
    assert(e.getMessage.contains("u_hll"))
    intercept[IllegalArgumentException] {
      Maintain.distinctSummarize(df, Seq("k"), "u", lgConfigK = 2)
    }
  }

  test("merge: a missing summary column fails loudly; empty spec rejected") {
    val base = Maintain.summarize(facts(Seq("a" -> bd("1.00"))), Seq("k"), spec)
    val bad = base.drop("v_min")
    val e = intercept[IllegalArgumentException] {
      Maintain.merge(base, bad, Seq("k"), spec)
    }
    assert(e.getMessage.contains("v_min"))
    intercept[IllegalArgumentException] { SummarySpec() }
  }

  private def snap(rows: Seq[(Long, String, java.lang.Double)]) =
    table("id bigint, seg string, bal double",
      rows.map { case (k, s, v) => row(k, s, v) })

  test("snapshotDiff: insert/delete/update incl. NULL drift; unchanged emit nothing") {
    val prev = snap(Seq((1L, "A", 5.0), (2L, "B", 6.0), (3L, "C", null),
      (4L, "D", 8.0)))
    val next = snap(Seq((1L, "A", 5.0),             // unchanged -> no row
      (2L, "B", 9.0),                               // update (value)
      (3L, "C", 7.5),                               // update (NULL -> value)
      (5L, "E", 1.0)))                              // insert; 4 deleted
    val got = Maintain.snapshotDiff(prev, next, Seq("id"), Seq("seg", "bal"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "update"), (3L, "update"), (4L, "delete"),
      (5L, "insert")), got.toString)
  }

  test("snapshotDiff: duplicate key raises loudly; disjoint key/compare enforced") {
    val dup = snap(Seq((1L, "A", 1.0), (1L, "A", 2.0)))
    val ok = snap(Seq((1L, "A", 1.0)))
    val e = intercept[Exception] {
      Maintain.snapshotDiff(dup, ok, Seq("id"), Seq("seg", "bal")).collect()
    }
    assert(e.getMessage.contains("duplicate key"), e.getMessage)
    intercept[IllegalArgumentException] {
      Maintain.snapshotDiff(ok, ok, Seq("id"), Seq("id", "bal"))
    }
  }

  test("snapshotDiff -> applyChanges roundtrip: applying the diff to prev yields next") {
    import graft.operators.AsOfJoin
    val prev = snap((1L to 60L).filter(_ % 4 != 0).map(k =>
      (k, s"s${k % 5}", java.lang.Double.valueOf(k.toDouble))))
    val next = snap((1L to 60L).filter(_ % 5 != 0).map(k =>
      (k, s"s${k % 5}",
        java.lang.Double.valueOf(if (k % 3 == 0) k + 100.0 else k.toDouble))))
    val diff = Maintain.snapshotDiff(prev, next, Seq("id"), Seq("seg", "bal"))
    // diff rows -> a change feed: upsert carries the NEXT values
    val changes = diff.select(col("id"), lit(1L).as("ts"),
      when(col("change_type") === "delete", lit("delete"))
        .otherwise(lit("upsert")).as("op"),
      col("seg_next").as("seg"), col("bal_next").as("bal"))
    val state = prev.select(col("id"), col("seg"), col("bal"),
      lit(0L).as("ts"))
    val applied = AsOfJoin.applyChanges(state, changes, "id", "ts", "op",
        Seq("seg", "bal"))
      .select("id", "seg", "bal").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val expected = next.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(applied == expected)
  }
}
