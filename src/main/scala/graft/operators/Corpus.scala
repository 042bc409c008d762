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

  /** Sliding-window token chunking — the packing step ahead of
    * tokenizer/training: each document's token stream splits into
    * `chunkSize`-token windows advancing by `stride` (stride <
    * chunkSize gives overlapping context windows). Pure built-ins
    * (sequence/transform/slice + posexplode): map-only until the
    * explode, which multiplies rows by ~n/stride — no shuffle at all.
    * Documents yield at least one (possibly short) chunk; the final
    * window holds the tail. */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0)
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    val nChunks = greatest(
      (ceil((n - lit(chunkSize)).cast("double") / stride) + 1).cast("int"),
      lit(1))
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__nc") - 1),
          i => slice(col("__toks"), i * stride + 1, lit(chunkSize)))))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_tokens")
      .withColumn("n_chunk_tokens", size(col("chunk_tokens")))
  }

  /** TF-IDF weights per (document, token): smoothed
    * `tf * (ln((N+1)/(df+1)) + 1)`. Plan shape: one explode+count for
    * per-doc term frequencies (shuffle bounded by distinct (doc,
    * token)), the document-frequency table joined in — at corpus scale
    * the df table is vocabulary-sized, so Spark broadcasts it; the
    * per-doc side never reshuffles after its aggregation. N is taken
    * from a scalar count, not a window over the corpus. */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    val tf = df.select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("doc", "token")
      .agg(count(lit(1)).as("tf"))
    val dfreq = documentFrequencies(df, textCol)
    tf.join(broadcast(dfreq), "token")
      .withColumn("tfidf",
        col("tf") * (log((lit(n) + 1.0) / (col("doc_freq") + 1.0)) + 1.0))
      .select(col("doc").as(idCol), col("token"), col("tf"),
        col("doc_freq"), col("tfidf"))
  }
}
