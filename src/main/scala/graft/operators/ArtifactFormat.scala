package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Format-version stamp shared by every persisted model artifact
  * (BPE merges/vocabulary, IVF/PQ codebooks, NB models): each saved
  * frame carries a constant `format_version` column, and every load
  * verifies it BEFORE interpreting rows — so a future layout change
  * bumps [[Version]] and old jobs fail with a named cause instead of
  * silently mis-reading rows under the new interpretation. The check
  * is one bounded aggregate (three values at most reach the driver)
  * and artifacts are model-table-sized by construction. */
object ArtifactFormat {

  /** Current artifact layout version. Bump when any persisted model
    * schema or encoding changes incompatibly. */
  val Version = 1

  /** Stamp a frame about to be persisted. */
  def stamp(df: DataFrame): DataFrame =
    df.withColumn("format_version", lit(Version))

  /** Verify a just-read artifact frame and strip the stamp. Fails
    * loudly on a missing column (pre-versioning artifact — re-save
    * it) or a version this build does not read. */
  def checked(df: DataFrame, what: String, path: String): DataFrame = {
    require(df.columns.contains("format_version"),
      s"$what at $path has no format_version column — it predates " +
        "artifact versioning; re-save it with this build")
    val vs = df.select(col("format_version").cast("int").as("v"))
      .distinct().limit(3).collect().map(_.getInt(0)).toSeq.sorted
    require(vs.isEmpty || vs == Seq(Version),
      s"$what at $path has format_version ${vs.mkString(",")} — this " +
        s"build reads version $Version only")
    df.drop("format_version")
  }
}
