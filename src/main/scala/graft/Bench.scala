package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Failure policy: a query that throws is reported LOUDLY — its message
  * lands in the `errors` JSON map, its timing is excluded from `total`,
  * and the process exits nonzero — never silently converted into a
  * timing (a crashed query has no meaningful wall time).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // Warm-up: absorb session/codegen startup and first-touch file I/O
    // (parquet footers, OS page cache) so the first timed query isn't
    // charged for them; queries then run in name order so timings are
    // comparable across rounds (Map order is arbitrary).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "part", "nation", "events",
        "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val results: Seq[(String, Double, Option[String])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        }
        (name, (System.nanoTime() - t0) / 1e9, err)
      }
    val qs = results.map { case (k, v, _) => s"\"${esc(k)}\":$v" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"\"${esc(k)}\":\"${esc(m)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
