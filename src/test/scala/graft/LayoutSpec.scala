package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.testkit.SparkTestKit._

class LayoutSpec extends AnyFunSuite {

  test("mortonInterleave: hand-computed bit weave; out-of-range raises") {
    // x=3 (bits 0,1) -> even positions 0,2 = 5; y=1 (bit 0) -> odd
    // position 1 = 2; together 7. x=0,y=3 -> odd positions 1,3 = 10.
    val df = table("x bigint, y bigint", Seq(
      row(3L, 1L), row(0L, 3L), row(5L, 0L), row(65535L, 65535L)))
    val got = df.select(Layout.mortonInterleave(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=5 (bits 0,2) -> positions 0,4 = 17; max/max -> all 32 bits set
    assert(got == Seq(7L, 10L, 17L, (1L << 32) - 1), got.toString)
    val e = intercept[Throwable] {
      table("x bigint, y bigint", Seq(row(65536L, 0L)))
        .select(Layout.mortonInterleave(col("x"), col("y"))).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("normalize dimensions first"), msgs.take(300))
  }

  test("minMaxCell: exact integer cells, full range covered, no float rounding") {
    // span 3 over 4 bits: v=10 -> 0, v=11 -> 5, v=12 -> 10 (16*2/3)
    val df = table("v bigint", Seq(row(10L), row(11L), row(12L)))
    val got = df.select(Layout.minMaxCell(col("v"), 10L, 12L, bits = 4))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 5L, 10L), got.toString)
    // extremes of a power-of-two span map to cell 0 and the last cell
    val ext = table("v bigint", Seq(row(0L), row(1023L)))
      .select(Layout.minMaxCell(col("v"), 0L, 1023L, bits = 16))
      .collect().map(_.getLong(0)).toSeq
    assert(ext == Seq(0L, 65472L), ext.toString) // 1023*65536/1024
  }

  test("zOrder: a predicate on either dimension prunes files; lex sort prunes only one") {
    import graft.testkit.SparkTestKit.spark
    import spark.implicits._
    // 64x64 grid, both dims uniform — the honest layout benchmark
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y")
    def filesTouched(dir: String, pred: org.apache.spark.sql.Column): Int = {
      val read = spark.read.parquet(dir).filter(pred)
      read.select(input_file_name()).distinct().count().toInt
    }
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val lexDir = java.nio.file.Files.createTempDirectory("lex").toString
    try {
      Layout.zOrder(grid, "x", "y", numPartitions = 16, bits = 6)
        .write.mode("overwrite").parquet(zDir)
      // the naive alternative: files split along y only
      grid.repartitionByRange(16, col("y")).sortWithinPartitions("y")
        .write.mode("overwrite").parquet(lexDir)
      val total = spark.read.parquet(zDir)
        .select(input_file_name()).distinct().count().toInt
      assert(total == 16, s"expected 16 z files, got $total")
      // x-slice: z-order confines it to a minority of files; the
      // y-sorted layout must read every file
      val zx = filesTouched(zDir, col("x") === 5)
      val lx = filesTouched(lexDir, col("x") === 5)
      assert(zx <= 6, s"z-order x-slice touched $zx of 16 files")
      assert(lx == 16, s"y-sorted x-slice touched $lx files")
      // y-slice: both layouts prune (z-order keeps ~the same power)
      val zy = filesTouched(zDir, col("y") === 5)
      assert(zy <= 6, s"z-order y-slice touched $zy of 16 files")
    } finally {
      graft.streaming.StreamGate.deleteRecursively(zDir)
      graft.streaming.StreamGate.deleteRecursively(lexDir)
    }
  }

  test("compactionPlan: sorted-fill bins hand-computed, large files skipped") {
    // target 100, skip >= 80. Sorted (bytes desc, path):
    //   f70(70) rt=0   bin 0
    //   f60(60) rt=70  bin 0
    //   f50(50) rt=130 bin 1
    //   f40(40) rt=180 bin 1
    //   a10(10) rt=220 bin 2   (ties on bytes break by path: a10 < b10)
    //   b10(10) rt=230 bin 2
    // f90 and f80 are >= skip -> bin NULL
    val manifest = table("path string, bytes bigint", Seq(
      row("f90", 90L), row("f80", 80L), row("f70", 70L), row("f60", 60L),
      row("f50", 50L), row("f40", 40L), row("a10", 10L), row("b10", 10L)))
    val got = Layout.compactionPlan(manifest, "path", "bytes",
        targetBytes = 100L, skipAtOrAbove = 80L)
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got == Seq(
      ("a10", 10L, Some(2L)), ("b10", 10L, Some(2L)),
      ("f40", 40L, Some(1L)), ("f50", 50L, Some(1L)),
      ("f60", 60L, Some(0L)), ("f70", 70L, Some(0L)),
      ("f80", 80L, None), ("f90", 90L, None)))
    // corrupt manifests fail loudly, never plan silently
    val nullRow = table("path string, bytes bigint",
      Seq(row("x", 1L), row(null.asInstanceOf[String], 2L)))
    assert(intercept[IllegalArgumentException] {
      Layout.compactionPlan(nullRow, "path", "bytes", 100L, 80L)
    }.getMessage.contains("corrupt"))
    val negRow = table("path string, bytes bigint", Seq(row("x", -1L)))
    assert(intercept[IllegalArgumentException] {
      Layout.compactionPlan(negRow, "path", "bytes", 100L, 80L)
    }.getMessage.contains("corrupt"))
    // parameter validation: skip above target is self-contradictory
    assert(intercept[IllegalArgumentException] {
      Layout.compactionPlan(manifest, "path", "bytes", 100L, 200L)
    }.getMessage.contains("skipAtOrAbove"))
  }

  test("pruningReport: sorted layout prunes, shuffled layout scans everything, NULL bounds") {
    // 40 rows, pred = id, 10-row files. Sorted by id: file bounds are
    // [0,9][10,19][20,29][30,39] -> probe [12,17] scans exactly file 1.
    // "Shuffled" order (id*17 mod 40 is a permutation) interleaves the
    // domain so every file's range covers the probe -> all 4 scanned.
    val df = table("id bigint, shuf bigint",
      (0L until 40L).map(i => row(i, (i * 17) % 40)))
    val probes = Seq((12.0, 17.0))
    val sorted = Layout.pruningReport(df, Seq("id"), "id", 10, probes).head()
    assert(sorted.getLong(2) == 4 && sorted.getLong(3) == 1 &&
      sorted.getLong(4) == 10, sorted.toString)
    val shuffled = Layout.pruningReport(df, Seq("shuf"), "id", 10, probes).head()
    assert(shuffled.getLong(3) == 4 && shuffled.getLong(4) == 40,
      shuffled.toString)
    // an all-NULL-pred file reports NULL bounds and never matches a
    // range probe; its rows still count toward nothing scanned
    val withNull = table("id bigint, v double",
      (0L until 10L).map(i => row(i, if (i < 5) null else i.toDouble)))
    val nr = Layout.pruningReport(withNull, Seq("id"), "v", 5,
      Seq((0.0, 100.0))).head()
    assert(nr.getLong(2) == 2 && nr.getLong(3) == 1 && nr.getLong(4) == 5,
      nr.toString)
    intercept[IllegalArgumentException] {
      Layout.pruningReport(df, Seq("id"), "id", 10, Seq((5.0, 1.0)))
    }
    intercept[IllegalArgumentException] {
      Layout.pruningReport(df, Seq("id"), "id", 0, probes)
    }
    // reproducibility contract: duplicate layout keys (a coarse order
    // column) make file membership run-dependent — refused loudly,
    // pointing the caller at a tie-break column
    val coarse = table("grp bigint, id bigint",
      (0L until 40L).map(i => row(i % 4, i)))
    val err = intercept[IllegalArgumentException] {
      Layout.pruningReport(coarse, Seq("grp"), "id", 10, probes)
    }
    assert(err.getMessage.contains("tie-break"), err.getMessage)
    // the same coarse column WITH a tie-break appended is fine
    assert(Layout.pruningReport(coarse, Seq("grp", "id"), "id", 10, probes)
      .head().getLong(2) == 4)
  }
}
