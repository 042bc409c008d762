package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage: Fellegi–Sunter log-likelihood
  * scoring over blocked candidate pairs — the decision layer the
  * blocking operators ([[Fuzzy.blockedFuzzyPairs]], the LSH family)
  * produce candidates FOR. Given, per comparison field, the
  * probability the field agrees on a TRUE match (`m`) and on a random
  * non-match (`u`), every candidate pair scores
  * `Σ_fields ln(m/u)` over agreeing fields plus
  * `Σ ln((1−m)/(1−u))` over disagreeing ones — the classic
  * Fellegi–Sunter (1969) log-likelihood ratio; the field weights are
  * the published "agreement/disagreement weights" of survey-office
  * deduplication. No reference counterpart — statistics-pipeline
  * extension (the reference library's home domain).
  */
object Linkage {

  /** One comparison field: its column name (present in BOTH record
    * frames) and its Fellegi–Sunter probabilities — `m` =
    * P(agree | match), `u` = P(agree | non-match). `0 < u < m < 1`
    * is required loudly: a field with `m <= u` carries no linkage
    * evidence (its weights invert) and a boundary probability makes a
    * log weight infinite. */
  final case class FsField(name: String, m: Double, u: Double) {
    require(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0,
      s"field '$name': m ($m) and u ($u) must be strictly inside (0, 1)")
    require(m > u,
      s"field '$name': m ($m) must exceed u ($u) — otherwise agreement " +
        "is evidence AGAINST a match and the weights invert")
    def agreeWeight: Double = math.log(m / u)
    def disagreeWeight: Double = math.log((1.0 - m) / (1.0 - u))
  }

  /** Score candidate pairs: join each (id_a, id_b) to its two records
    * (plain equi joins on the ids — AQE broadcasts a small side,
    * unhinted per the file conventions elsewhere), then a MAP-ONLY
    * projection sums per-field weights. Field semantics: agreement is
    * null-safe VALUE equality after a string cast; a field NULL on
    * EITHER side contributes nothing (missing data is no evidence
    * either way — the standard FS treatment, NOT agreement). The
    * score rides the 6dp gate and `is_match` compares the ROUNDED
    * score against `matchThreshold` (the iqrOutlierFlags boundary
    * discipline — a sub-gate margin cannot flip the verdict between
    * engines).
    *
    * Scale shape: two hash joins keyed on record ids + one map-only
    * scoring pass; cost tracks the candidate count the blocking stage
    * already bounded, never |left|×|right|. Output: (`id_a`, `id_b`,
    * `n_agree`, `score6`, `is_match`). */
  def fellegiSunterScores(
      candidates: DataFrame,
      idACol: String,
      idBCol: String,
      left: DataFrame,
      leftIdCol: String,
      right: DataFrame,
      rightIdCol: String,
      fields: Seq[FsField],
      matchThreshold: Double): DataFrame = {
    require(fields.nonEmpty, "fellegiSunterScores needs comparison fields")
    require(fields.map(_.name).distinct.size == fields.size,
      s"duplicate comparison fields: ${fields.map(_.name).mkString(", ")}")
    fields.foreach { f =>
      require(left.columns.contains(f.name) && right.columns.contains(f.name),
        s"comparison field '${f.name}' must exist in both record frames")
    }
    val l = left.select((leftIdCol +: fields.map(_.name)).distinct.map(col): _*)
      .alias("__fl")
    val r = right.select((rightIdCol +: fields.map(_.name)).distinct.map(col): _*)
      .alias("__fr")
    val joined = candidates
      .select(col(idACol).as("id_a"), col(idBCol).as("id_b"))
      .join(l, col("id_a") === col(s"__fl.$leftIdCol"))
      .join(r, col("id_b") === col(s"__fr.$rightIdCol"))
    def lf(f: FsField): Column = col(s"__fl.${f.name}").cast("string")
    def rf(f: FsField): Column = col(s"__fr.${f.name}").cast("string")
    val agreeFlags = fields.map(f =>
      when(lf(f).isNull || rf(f).isNull, lit(null).cast("boolean"))
        .otherwise(lf(f) === rf(f)))
    val terms = fields.zip(agreeFlags).map { case (f, a) =>
      when(a.isNull, lit(0.0))
        .when(a, lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight))
    }
    val nAgree = agreeFlags
      .map(a => when(coalesce(a, lit(false)), 1L).otherwise(0L))
      .reduce(_ + _)
    joined.select(col("id_a"), col("id_b"),
        nAgree.as("n_agree"),
        round(terms.reduce(_ + _), 6).as("score6"))
      .withColumn("is_match", col("score6") >= lit(matchThreshold))
  }
}
