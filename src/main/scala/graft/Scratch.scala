package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.Tables

// Throwaway profiling harness — not part of the library.
object Scratch {
  def time(name: String)(f: => Long): Unit = {
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = Tables.documents(spark, dir)
    docs0.count()

    val docs = docs0.select(col("doc_id").as("id"),
      GraftFunctions.shingles(docs0,
        TextFunctions.tokens(col("text")), 3).as("sh"))

    time("A_full_current") {
      Dedup.windowedNgramJaccardPairs(docs0, "doc_id", "text", 3, 25, 0.01).count()
    }
    time("B_shingle_only") { docs.agg(sum(size(col("sh")))).head(); docs.count() }
    time("C_join_no_arrays") {
      val ids = docs.select(col("id"))
      ids.select(col("id").as("id_a"),
          explode(sequence(col("id") + 1, col("id") + 25)).as("id_b"))
        .join(ids.select(col("id").as("id_b")), "id_b").count()
    }
    time("D_join_arrays_no_jaccard") {
      docs.select(col("id").as("id_a"), col("sh").as("sh_a"),
          explode(sequence(col("id") + 1, col("id") + 25)).as("id_b"))
        .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(size(col("sh_a")) + size(col("sh_b"))).agg(sum(col("(size(sh_a) + size(sh_b))"))).head()
      1L
    }
    spark.stop()
  }
}
