package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multinomial Naive Bayes text classification — the fasttext-shaped
  * learned filter of production data pipelines (language-ID refinement,
  * quality classification against a reference corpus, domain routing),
  * trained and applied entirely as dataflow. LLM-pipeline extension; no
  * reference counterpart.
  *
  * Why NB and not a gradient model: the sufficient statistics are pure
  * counts, so training is ONE map-side-combined, vocabulary-bounded
  * aggregation pass over the corpus — no iterations, no driver-side
  * weight vector, and bit-reproducible across partitionings (integer
  * counts commute). That is exactly the CCNet/fastText recipe's role:
  * a cheap, deterministic, trainable gate in front of expensive model
  * inference.
  *
  * Scale shape: per-(token, class) counts are the only corpus-sized
  * aggregation (map-side combined, keyed by token — shuffle bounded by
  * vocabulary, never token volume); class totals, vocabulary size, and
  * doc counts are bounded driver scalars (the q68 BM25 pattern);
  * scoring joins each doc's term frequencies to the per-token log-odds
  * table UNHINTED, so AQE broadcasts real vocabularies and an unbounded
  * one degrades to a shuffle join instead of an OOM; the per-doc sum is
  * map-side combined. Out-of-vocabulary tokens (scoring a corpus the
  * model never saw) fall back to the Laplace floor, so apply never
  * fails on unseen text.
  */
object Classify {

  /** A trained binary NB model: `vocab` is one row per training token —
    * (token, lp_pos, lp_neg), the smoothed per-class log conditionals —
    * kept DISTRIBUTED (a web-scale vocabulary never has to fit on the
    * driver); the scalars are the class prior log-odds and the
    * per-class Laplace floors for unseen tokens. */
  final case class NbModel(
      vocab: DataFrame,
      priorLogOdds: Double,
      floorPos: Double,
      floorNeg: Double)

  /** Train a binary multinomial NB with Laplace smoothing `alpha`:
    * lp_c(t) = ln((count(t, c) + alpha) / (tokens(c) + alpha * V))
    * with V = |training vocabulary| (distinct tokens across BOTH
    * classes), prior log-odds = ln(docs_pos / docs_neg). `labelCol`
    * must be boolean-valued; both classes must be present (a
    * single-class "model" would hide itself inside an infinite prior —
    * rejected loudly instead). One corpus pass + two bounded driver
    * aggregates; the per-token table stays distributed. */
  def trainNaiveBayes(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      alpha: Double = 1.0): NbModel = {
    require(alpha > 0.0, s"alpha ($alpha) must be positive")
    val docCounts = df.agg(
      sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)),
      count(lit(1))).head()
    val nPos = docCounts.getLong(0)
    val nTot = docCounts.getLong(1)
    require(nPos > 0 && nPos < nTot,
      s"trainNaiveBayes needs both classes present, got $nPos positive " +
        s"of $nTot docs")
    val cc = df.select(col(labelCol).cast("boolean").as("pos"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cneg"))
    val scal = cc.agg(sum("cpos"), sum("cneg"), count(lit(1))).head()
    val totPos = scal.getLong(0)
    val totNeg = scal.getLong(1)
    val v = scal.getLong(2)
    val vocab = cc.select(col("token"),
      log((col("cpos") + alpha) / lit(totPos + alpha * v)).as("lp_pos"),
      log((col("cneg") + alpha) / lit(totNeg + alpha * v)).as("lp_neg"))
    NbModel(vocab,
      priorLogOdds = math.log(nPos.toDouble / (nTot - nPos).toDouble),
      floorPos = math.log(alpha / (totPos + alpha * v)),
      floorNeg = math.log(alpha / (totNeg + alpha * v)))
  }

  /** Score every document: log_odds = prior log-odds +
    * sum over the doc's distinct tokens of tf * (lp_pos - lp_neg),
    * with unseen tokens at the per-class Laplace floors; `predicted` =
    * log_odds > 0. One tf aggregation (map-side combined), one
    * unhinted vocab join, one per-doc sum — every doc comes back even
    * when its token set is empty (prior-only score). */
  def scoreNaiveBayes(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: NbModel): DataFrame = {
    val dtf = df.select(col(idCol).as("__id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("__id", "token").agg(count(lit(1)).as("tf"))
    val delta = coalesce(col("lp_pos"), lit(model.floorPos)) -
      coalesce(col("lp_neg"), lit(model.floorNeg))
    val sums = dtf.join(model.vocab, Seq("token"), "left")
      .groupBy("__id")
      .agg(sum(col("tf") * delta).as("__s"))
    df.select(col(idCol).as("__id"))
      .join(sums, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        (lit(model.priorLogOdds) + coalesce(col("__s"), lit(0.0)))
          .as("log_odds"))
      .withColumn("predicted", col("log_odds") > 0.0)
  }

  /** Persist a trained model: the vocabulary table as parquet plus one
    * scalar row — the [[Ivf.save]] artifact discipline, so the gate
    * trains once and every ingestion job loads it. */
  def save(model: NbModel, path: String): Unit = {
    model.vocab.select("token", "lp_pos", "lp_neg")
      .write.mode("overwrite").parquet(s"$path/vocab")
    model.vocab.sparkSession.range(1).select(
        lit(model.priorLogOdds).as("prior_log_odds"),
        lit(model.floorPos).as("floor_pos"),
        lit(model.floorNeg).as("floor_neg"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[save]]d model. Doubles roundtrip parquet bit-exactly, so
    * a loaded model scores identically to the in-JVM one (pinned by
    * spec). Corrupted artifacts fail loudly: the meta frame must be
    * exactly one row and the vocab frame must carry the three model
    * columns. */
  def load(spark: SparkSession, path: String): NbModel = {
    val meta = spark.read.parquet(s"$path/meta")
      .select("prior_log_odds", "floor_pos", "floor_neg").collect()
    require(meta.length == 1,
      s"NB model at $path is corrupted: ${meta.length} meta rows, expected 1")
    val vocab = spark.read.parquet(s"$path/vocab")
      .select("token", "lp_pos", "lp_neg")
    NbModel(vocab, meta(0).getDouble(0), meta(0).getDouble(1),
      meta(0).getDouble(2))
  }

  /** Label-error screen — the confident-learning recipe (Northcutt et
    * al., "Confident Learning", JAIR'21, reduced to its actionable
    * core) over noisy binary labels: split the corpus into folds,
    * score every document with a model trained WITHOUT its fold
    * (out-of-fold prediction — a model that memorized a wrong label
    * would otherwise agree with it), and flag documents where the
    * model CONFIDENTLY disagrees with the recorded label
    * (`predicted != label` and `|log_odds| >= margin`). Flagged rows
    * are the re-annotation queue: on corpora with planted label flips
    * the flags concentrate on the flips, which is exactly the q178
    * oracle construction.
    *
    * The caller supplies `foldCol` (e.g. `id % 2`, or a portable-hash
    * residue) so fold assignment is explicit, deterministic, and
    * engine-replayable — never an RNG inside the operator. Folds are
    * bounded (2..16, checked loudly): training runs once per fold
    * over the fold's complement, so the corpus is scanned `k` times —
    * the price of out-of-fold scoring, linear in the bounded fold
    * count, each pass [[trainNaiveBayes]]'s one-shuffle shape. Noisy
    * labels train the models too — the realistic setting; confident
    * disagreement survives its own noise because NB averages over the
    * class, not the row.
    *
    * `log_odds` is rounded to 6 BEFORE both the sign test and the
    * margin test ([[graft.operators.Eval.rocAuc]]'s discipline), so a
    * cross-engine ulp cannot flip a flag.
    *
    * Output: one row per input doc — id, `label`, `fold`,
    * `log_odds6`, `mislabel_flag`. */
  def labelErrorScreen(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      foldCol: String,
      margin: Double,
      alpha: Double = 1.0): DataFrame = {
    require(margin >= 0.0, s"margin ($margin) must be >= 0")
    val folds = df.select(col(foldCol)).distinct().collect().map(_.get(0))
    require(!folds.contains(null),
      "labelErrorScreen: NULL fold values — assign every row a fold")
    require(folds.length >= 2 && folds.length <= 16,
      s"labelErrorScreen: ${folds.length} folds — need 2..16 (1 fold has " +
        "no out-of-fold complement; more than 16 re-scans the corpus " +
        "once per fold)")
    val scored = folds.map { f =>
      val model = trainNaiveBayes(
        df.filter(col(foldCol) =!= lit(f)), textCol, labelCol, alpha)
      val slice = df.filter(col(foldCol) === lit(f))
      scoreNaiveBayes(slice, idCol, textCol, model)
        .join(slice.select(col(idCol),
          col(labelCol).cast("boolean").as("label"),
          col(foldCol).as("fold")), Seq(idCol))
    }.reduce(_.unionByName(_))
    scored
      .select(col(idCol), col("label"), col("fold"),
        round(col("log_odds"), 6).as("log_odds6"))
      .withColumn("mislabel_flag",
        ((col("log_odds6") > 0.0) =!= col("label")) &&
          abs(col("log_odds6")) >= margin)
  }
}
