package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor — the
  * centroid-partitioned scale path for embedding search, complementing
  * the sign-LSH variant ([[Similarity.annTopK]]).
  *
  * Three phases, each with the right distribution shape:
  *  - '''train''': k centroids by Lloyd's algorithm over a
  *    deterministic hash-sampled subset, computed on the driver. The
  *    sample is bounded by `sampleMod` (collect only every
  *    `sampleMod`-th vector by id hash — a pushdown-able filter, not a
  *    full-corpus collect), and sorted by id first so the model is
  *    independent of partitioning.
  *  - '''assign''': map-only nearest-centroid (max cosine) cell id per
  *    vector via the native codegen cosine — k fused loops per row, no
  *    shuffle. At 100 TB this is the only full-corpus pass, and it
  *    parallelizes perfectly.
  *  - '''search''': probe only the `nprobe` cells nearest the query
  *    (cell ranking is a driver-side k-element computation), then exact
  *    cosine top-k over the pruned candidates — a filter that prunes
  *    ~(1 - nprobe/k) of the corpus ahead of any scoring.
  *
  * No RNG state anywhere: sampling is id-hash-based and init picks
  * evenly spaced sorted sample vectors, so every run and every executor
  * derives the identical model.
  */
object Ivf {

  final case class Model(centroids: Vector[Array[Float]]) {
    def k: Int = centroids.length
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Train k centroids on a deterministic sample. `sampleMod = m` keeps
    * ~1/m of the corpus (id-hash filter); the sample must fit on the
    * driver — choose m so it does. */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      sampleMod: Int = 1,
      seed: Long = 42L): Model = {
    require(k > 0 && iters >= 0 && sampleMod > 0)
    val sampled = df
      .filter(pmod(xxhash64(col(idCol), lit(seed)), lit(sampleMod)) === 0)
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(sampled.length >= k,
      s"sample of ${sampled.length} vectors cannot seed $k centroids")
    // deterministic init: evenly spaced vectors of the id-sorted sample
    var centroids: Vector[Array[Float]] =
      (0 until k).map(i => sampled((i.toLong * sampled.length / k).toInt).clone()).toVector
    var it = 0
    while (it < iters) {
      val dims = centroids.head.length
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Long](k)
      sampled.foreach { v =>
        var best = 0; var bestCos = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          val cs = cosine(v, centroids(c))
          if (cs > bestCos) { bestCos = cs; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dims) { sums(best)(d) += v(d); d += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else Array.tabulate(dims)(d => (sums(c)(d) / counts(c)).toFloat)
      }.toVector
      it += 1
    }
    Model(centroids)
  }

  /** Map-only cell assignment: argmax-cosine centroid per vector.
    * Ties break toward the higher cell id (struct max), deterministic. */
  def assign(df: DataFrame, vecCol: String, model: Model,
      cellCol: String = "cell"): DataFrame = {
    val scored = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(
        GraftFunctions.cosineF32(df, col(vecCol), Similarity.vectorLit(c.toSeq)).as("cos"),
        lit(i).as("cell"))
    }: _*)
    df.withColumn(cellCol, array_max(scored).getField("cell"))
  }

  /** Exact cosine top-k over the `nprobe` cells nearest the query. */
  def search(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      query: Seq[Float],
      topK: Int,
      nprobe: Int,
      cellCol: String = "cell"): DataFrame = {
    val q = query.toArray
    val cells = model.centroids.zipWithIndex
      .map { case (c, i) => (cosine(q, c), i) }
      .sortBy { case (cos, i) => (-cos, i) }
      .take(nprobe).map(_._2)
    assigned
      .filter(col(cellCol).isin(cells: _*))
      .select(col(idCol),
        GraftFunctions.cosineF32(assigned, col(vecCol), Similarity.vectorLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(topK)
  }
}
