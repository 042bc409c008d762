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
  *    deterministic hash-sampled subset, run DISTRIBUTED: each
  *    iteration is one map-only assignment pass plus a map-side-
  *    combined (cell, dim) partial-sum aggregation — the only data the
  *    driver ever holds is the k x dims model itself. `sampleMod`
  *    bounds the training subset (a pushdown-able id-hash filter), but
  *    the subset no longer has to fit in driver memory: at 100 TB a
  *    billion-vector sample trains exactly like a thousand-vector one.
  *  - '''assign''': map-only nearest-centroid (max cosine) cell id per
  *    vector via the native codegen cosine — k fused loops per row, no
  *    shuffle. At 100 TB this is the only full-corpus pass, and it
  *    parallelizes perfectly.
  *  - '''search''': probe only the `nprobe` cells nearest the query
  *    (cell ranking is a driver-side k-element computation), then exact
  *    cosine top-k over the pruned candidates — a filter that prunes
  *    ~(1 - nprobe/k) of the corpus ahead of any scoring.
  *
  * No RNG state anywhere: sampling is id-hash-based, init picks evenly
  * spaced vectors of the id-sorted sample, and the per-cell sums
  * accumulate in exact decimals (order-independent addition), so every
  * run on every partitioning derives the identical model.
  */
object Ivf {

  final case class Model(centroids: Vector[Array[Float]]) {
    def k: Int = centroids.length
  }

  private[operators] def cosine(a: Array[Float], b: Array[Float]): Double = {
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

  /** Train k centroids on a deterministic sample, fully distributed.
    * `sampleMod = m` keeps ~1/m of the corpus (id-hash filter applied
    * before anything else, so column pruning and pushdown still reach
    * the scan). Per iteration: a map-only nearest-centroid assignment
    * (the same native-cosine expression [[assign]] uses, so train and
    * assign share one tie-breaking rule), then `posexplode` of each
    * vector into (cell, dim, value) and a map-side-combined aggregation
    * down to k x dims rows — the shuffle carries one partial sum per
    * (cell, dim) per map task, never a vector. Only the k x dims model
    * ever reaches the driver.
    *
    * Determinism without collecting: init picks evenly spaced rows of
    * the id-sorted sample via [[General.withContiguousRowIds]] (a
    * range-partitioned sort; only the k seed rows come back), and the
    * per-cell component sums accumulate as DECIMAL(30,15) — exact,
    * order-independent addition, so the centroids are bit-identical
    * under any partitioning or shuffle arrival order, where a double
    * sum would drift by ulps from run to run. */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      sampleMod: Int = 1,
      seed: Long = 42L): Model = {
    require(k > 0 && iters >= 0 && sampleMod > 0)
    // The sample is read (iters + 2) times (init indexing + one
    // assignment pass per iteration); persist it for the duration of
    // training and release it before returning — the classic iterative-
    // ML cache, bounded by sampleMod, never the full corpus.
    // The sample size rides the FIRST action over the persisted sample
    // (the init sort inside trainOnSample) as an observed metric — the
    // previous max(row id) pass was a whole extra job just to learn n.
    val obs = org.apache.spark.sql.Observation()
    val sampled = df
      .filter(pmod(xxhash64(col(idCol), lit(seed)), lit(sampleMod)) === 0)
      .select(col(idCol), col(vecCol))
      .observe(obs, count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      trainOnSample(sampled, obs, idCol, vecCol, k, iters)
    } finally sampled.unpersist(blocking = false)
  }

  private def trainOnSample(
      sampled: DataFrame,
      nObs: org.apache.spark.sql.Observation,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Model = {
    // deterministic init: evenly spaced vectors of the id-sorted sample
    val indexed = General.withContiguousRowIds(sampled, Seq(idCol), "__rid")
    val n = scala.concurrent.Await.result(
      nObs.future, scala.concurrent.duration.Duration(30, "seconds")).getLong(0)
    require(n >= k, s"sample of $n vectors cannot seed $k centroids")
    val targets = (0 until k).map(i => i.toLong * n / k)
    var centroids: Vector[Array[Float]] = indexed
      .filter(col("__rid").isin(targets: _*))
      .orderBy(col("__rid"))
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray).toVector
    var it = 0
    while (it < iters) {
      val dims = centroids.head.length
      val assigned = assign(sampled, vecCol, Model(centroids), "__cell")
      val partials = assigned
        .select(col("__cell"), posexplode(col(vecCol)).as(Seq("__d", "__x")))
        .groupBy(col("__cell"), col("__d"))
        .agg(sum(col("__x").cast("double").cast("decimal(30,15)")).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val sums = Array.fill(k)(new Array[java.math.BigDecimal](dims))
      val counts = new Array[Long](k)
      partials.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        sums(c)(d) = r.getDecimal(2)
        if (d == 0) counts(c) = r.getLong(3)
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else Array.tabulate(dims)(d => (sums(c)(d).doubleValue() / counts(c)).toFloat)
      }.toVector
      it += 1
    }
    Model(centroids)
  }

  /** Persist a trained [[Model]] as plain parquet under `path` — one
    * (cell, centroid) row per centroid, float components bit-exact in
    * parquet. The production IVF loop trains once and serves many
    * assign/search jobs; without a save surface every job re-runs
    * Lloyd's iterations (the reference externalizes pipeline state to
    * files the same way, `/root/reference/ons_utils/config/
    * config.py:100-136`). The model is k rows — driver-bounded by
    * construction, like the training result itself. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false),
        nullable = false)))
    val rows = model.centroids.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq)
    }
    ArtifactFormat.stamp(spark.createDataFrame(rows.asJava, schema))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[save]]d model. Validated loudly: cells must be exactly
    * 0..k-1 (the array index IS the cell id every assign/probe/search
    * path keys on) and all centroids must share one dimensionality —
    * a corrupted artifact fails here, not as silently wrong
    * assignments. Bit-identical roundtrip: float components survive
    * parquet exactly, so a loaded model assigns and probes exactly
    * like the in-JVM one (pinned by spec). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = ArtifactFormat.checked(
        spark.read.parquet(path), "IVF model", path)
      .select(col("cell"), col("centroid"))
      .collect()
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, s"IVF model at $path is empty")
    val cells = rows.map(_.getInt(0)).toSeq
    require(cells == (0 until rows.length),
      s"IVF model at $path is corrupted: cells ${cells.take(20).mkString(",")}" +
        (if (cells.size > 20) ",..." else "") + " are not contiguous 0..k-1")
    val centroids = rows.map(_.getSeq[Float](1).toArray).toVector
    val dims = centroids.head.length
    require(dims > 0 && centroids.forall(_.length == dims),
      s"IVF model at $path is corrupted: centroid dimensionalities " +
        s"${centroids.map(_.length).distinct.mkString(",")} are not uniform")
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

  /** Multi-probe cell assignment: each vector EXPLODED into its
    * `nprobe` nearest cells — [[searchBatch]]'s probe idiom applied to
    * the corpus side. Ranking is (-cos, -cell) ascending: best cosine
    * first, ties toward the HIGHER cell id, so the FIRST probe is
    * always [[assign]]'s argmax cell (struct max, ties high) — a
    * corpus assigned with `assign` and probed with `assignProbes`
    * agrees on rank 1 even at exact cosine ties. (The QUERY-side
    * probe ranking in [[search]]/[[searchBatch]] keeps its historical
    * lower-cell tie-break; query probing never has to agree with a
    * stored argmax assignment, so the two orders are independent.)
    * This is the recall knob for cell-local pair operators
    * ([[Similarity.semanticDedup]]): a near-dup pair straddling one
    * argmax boundary still shares a cell at nprobe >= 2 unless BOTH
    * vectors' rankings diverge past nprobe. Map-only over centroid
    * literals; output carries every input column plus `cellCol`, with
    * each row duplicated nprobe ways (the deliberate cost of the
    * recall). */
  def assignProbes(df: DataFrame, vecCol: String, model: Model,
      nprobe: Int, cellCol: String = "cell"): DataFrame = {
    require(nprobe > 0 && nprobe <= model.k,
      s"nprobe ($nprobe) must be in [1, ${model.k}]")
    val scoredCells = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(
        (-GraftFunctions.cosineF32(df, col(vecCol), Similarity.vectorLit(c.toSeq))).as("neg"),
        lit(-i).as("negcell"))
    }: _*)
    df.withColumn(cellCol,
      explode(transform(slice(sort_array(scoredCells), 1, nprobe),
        s => -s.getField("negcell"))))
  }

  /** Batch ANN join: for EVERY query vector, the exact cosine top-k
    * over the `nprobe` cells nearest that query — "find each eval
    * doc's nearest training docs" as one dataflow, where [[search]] is
    * the single-query special case.
    *
    * Scale shape, stage by stage: (1) per-query cell ranking is
    * map-only — each query row scores the k centroid literals with the
    * native codegen cosine, sorts the k-element array, keeps `nprobe`
    * (never a join against a centroid table); (2) probes join the
    * assigned corpus on `cell` — a tiny probe side broadcasts (AQE),
    * a corpus-sized query side degrades to a shuffle join on exactly
    * the key the IVF index is stored partitioned by, and a popular
    * cell is AQE-skew-splittable because the probe row is duplicable;
    * (3) per-query top-k rides the bounded-heap
    * [[graft.functions.Aggregators.TopK]] — every map task reduces its
    * candidate slice to k before the qid shuffle, so the exchange
    * carries O(k x partitions) rows per query regardless of how many
    * candidates its cells held. */
  def searchBatch(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      topK: Int,
      nprobe: Int,
      cellCol: String = "cell"): DataFrame = {
    require(topK > 0 && nprobe > 0 && nprobe <= model.k)
    // (-cos, cell) structs: ascending sort = best cell first, ties to
    // the lower cell id — the same order `search` derives on the driver
    val scoredCells = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(
        (-GraftFunctions.cosineF32(queries, col(qVecCol), Similarity.vectorLit(c.toSeq))).as("neg"),
        lit(i).as("cell"))
    }: _*)
    val probes = queries
      .select(col(qIdCol).as("qid"), col(qVecCol).as("__qv"),
        explode(slice(sort_array(scoredCells), 1, nprobe)).as("__pr"))
      .select(col("qid"), col("__qv"), col("__pr.cell").as(cellCol))
    val cands = probes.join(assigned, Seq(cellCol))
    val scored = cands.select(col("qid"), col(idCol),
      GraftFunctions.cosineF32(cands, col(vecCol), col("__qv")).as("cosine"))
    graft.functions.Aggregators.topKPerGroup(
      scored, Seq("qid"), "cosine", idCol, topK)
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
