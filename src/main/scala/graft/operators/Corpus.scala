package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level statistics for training-data pipelines. */
object Corpus {

  /** Token frequency table: explode the token stream, count per token.
    * The canonical explode -> aggregate shape: partial (map-side)
    * aggregation collapses each partition's counts before the single
    * hash shuffle on token, so the shuffle carries one row per distinct
    * token per partition — vocabulary-bounded, not corpus-bounded. */
  def tokenFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))

  /** Document-frequency table: in how many documents each distinct
    * token appears. `array_distinct` before the explode keeps the
    * shuffle per-document-distinct — a token repeated 1000x in one doc
    * adds one row, which also bounds skew on stopwords. */
  def documentFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"))
}
