package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Product Quantization (PQ) — the FAISS-style compressed ANN path
  * completing the embedding-search family: [[Similarity]] gives exact
  * and sign-LSH search, [[Ivf]] gives cell-pruned search, PQ gives the
  * MEMORY story — a 64-dim float vector (256 bytes) compresses to `m`
  * small codes (m bytes at k <= 256), so a trillion-vector index fits
  * where raw vectors never could, and queries scan codes with a
  * per-query lookup table instead of touching floats.
  *
  * Three phases, same distribution discipline as [[Ivf]]:
  *  - '''train''': the vector space splits into `m` contiguous
  *    subspaces of dims/m components; each subspace learns `k`
  *    centroids by L2 Lloyd's — run for ALL subspaces in ONE dataflow
  *    per iteration (explode to (sub, cell, dim) and aggregate
  *    decimal partial sums map-side; the shuffle carries one partial
  *    per (sub, cell, dim) per map task, the driver only ever the
  *    m x k x dims/m model). L2 argmin dispatches through the native
  *    codegen dot product: argmin ||v-c||^2 = argmax (v.c - |c|^2/2),
  *    so assignment needs no per-centroid subtraction loop.
  *  - '''encode''': map-only — each vector becomes its `m` nearest
  *    sub-centroid ids in one projection (m x k fused dot products,
  *    no shuffle). This is the only full-corpus pass.
  *  - '''search (ADC)''': the query precomputes the m x k table of
  *    sub-dot-products ONCE on the driver (a bounded scalar table);
  *    each corpus row's approximate dot is `m` array lookups — no
  *    float vector is ever read at query time. Exact re-scoring of
  *    the tiny top-k candidate set restores true values downstream.
  *
  * Determinism mirrors [[Ivf.train]] end to end: id-hash sampling,
  * evenly spaced id-sorted seeds, DECIMAL(30,15) partial sums (exact,
  * order-independent), ties toward the higher cell id — bit-identical
  * models under any partitioning. LLM-pipeline extension; no reference
  * counterpart.
  */
object Pq {

  /** codebooks(sub)(cell) = centroid of that subspace cell. */
  final case class Model(codebooks: Vector[Vector[Array[Float]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length
  }

  private def normSq(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    s
  }

  /** All m nearest sub-centroid ids of `vec` — ONE native expression
    * ([[graft.expressions.PqEncode]]) looping the flattened codebook
    * at runtime: argmax of the dot-minus-half-norm surrogate (== L2
    * argmin) per subspace, ties toward the higher cell id (the
    * [[Ivf.assign]] struct-max convention, bit-identically
    * reproduced). The composed-builtins alternative — one scored
    * struct subtree per (sub, cell) — inlined m·k dot products into
    * the projection and blew Janino's 64 KB method limit at the test
    * geometry already (whole-stage codegen silently disabled); the
    * native loop keeps plan and codegen size constant in the codebook
    * dimensions. */
  private def allCodes(df: DataFrame, vec: Column, model: Model): Column =
    GraftFunctions.pqEncode(df, vec, model.codebooks)

  /** Map-only PQ encode: `codeCol` = the vector's `m` sub-centroid
    * ids, ordered by subspace. */
  def encode(df: DataFrame, vecCol: String, model: Model,
      codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol, allCodes(df, col(vecCol), model))

  /** Train an m x k PQ codebook set. Vector length must be divisible
    * by `m`; `k` must fit a byte-code deployment (<= 256). Sampling,
    * seeding, iteration, and empty-cell handling follow [[Ivf.train]]
    * verbatim — one assignment + one decimal partial-sum aggregation
    * per iteration covers ALL m subspaces. */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      iters: Int = 5,
      sampleMod: Int = 1,
      seed: Long = 42L): Model = {
    require(m > 0 && k > 0 && iters >= 0 && sampleMod > 0)
    require(k <= 256, s"k ($k) must be <= 256 — PQ codes are byte-sized")
    val sampled = df
      .filter(pmod(xxhash64(col(idCol), lit(seed)), lit(sampleMod)) === 0)
      .select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dims = sampled.select(size(col(vecCol))).head().getInt(0)
      require(dims % m == 0, s"vector length $dims is not divisible by m=$m")
      val dsub = dims / m
      // deterministic seeds: evenly spaced FULL vectors of the
      // id-sorted sample, sliced into their m sub-vectors
      val indexed = General.withContiguousRowIds(sampled, Seq(idCol), "__rid")
      val n = indexed.select(max(col("__rid"))).head().getLong(0) + 1
      require(n >= k, s"sample of $n vectors cannot seed $k centroids")
      val targets = (0 until k).map(i => i.toLong * n / k)
      val seeds = indexed
        .filter(col("__rid").isin(targets: _*))
        .orderBy(col("__rid"))
        .select(col(vecCol))
        .collect()
        .map(_.getSeq[Float](0).toArray)
      var codebooks: Vector[Vector[Array[Float]]] = Vector.tabulate(m)(s =>
        seeds.map(v => v.slice(s * dsub, (s + 1) * dsub)).toVector)
      var it = 0
      while (it < iters) {
        val model = Model(codebooks)
        // one exploded pass covers all m subspaces: (sub, cell, dim)
        // decimal partials, map-side combined, m*k*dsub rows total
        val codes = allCodes(sampled, col(vecCol), model)
        val subRows = sampled.select(explode(array((0 until m).map(s =>
            struct(lit(s).as("sub"),
              element_at(codes, s + 1).as("cell"),
              slice(col(vecCol), s * dsub + 1, dsub).as("sv"))): _*)).as("e"))
          .select(col("e.sub").as("__sub"), col("e.cell").as("__cell"),
            posexplode(col("e.sv")).as(Seq("__d", "__x")))
        val partials = subRows.groupBy("__sub", "__cell", "__d")
          .agg(sum(col("__x").cast("double").cast("decimal(30,15)")).as("__s"),
            count(lit(1)).as("__n"))
          .collect()
        val sums = Array.fill(m, k)(new Array[java.math.BigDecimal](dsub))
        val counts = Array.fill(m)(new Array[Long](k))
        partials.foreach { r =>
          val s = r.getInt(0); val c = r.getInt(1); val d = r.getInt(2)
          sums(s)(c)(d) = r.getDecimal(3)
          if (d == 0) counts(s)(c) = r.getLong(4)
        }
        codebooks = Vector.tabulate(m)(s => Vector.tabulate(k)(c =>
          if (counts(s)(c) == 0) codebooks(s)(c)
          else Array.tabulate(dsub)(d =>
            (sums(s)(c)(d).doubleValue() / counts(s)(c)).toFloat)))
        it += 1
      }
      Model(codebooks)
    } finally sampled.unpersist(blocking = false)
  }

  /** Persist a trained [[Model]] as plain parquet — one
    * (sub, cell, centroid) row per sub-centroid, the [[Ivf.save]]
    * artifact discipline: train once, encode/search everywhere. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sub",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false),
        nullable = false)))
    val rows = for {
      (book, s) <- model.codebooks.zipWithIndex
      (c, i) <- book.zipWithIndex
    } yield org.apache.spark.sql.Row(s, i, c.toSeq)
    ArtifactFormat.stamp(spark.createDataFrame(rows.asJava, schema))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[save]]d model. Validated loudly, [[Ivf.load]]-style:
    * (sub, cell) must tile exactly [0, m) x [0, k) and all centroids
    * must share one sub-dimensionality — a corrupted artifact fails
    * here, not as silently wrong codes. Float components roundtrip
    * parquet bit-exactly, so a loaded model encodes and ranks exactly
    * like the in-JVM one (pinned by spec). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = ArtifactFormat.checked(
        spark.read.parquet(path), "PQ model", path)
      .select(col("sub"), col("cell"), col("centroid"))
      .collect()
      .sortBy(r => (r.getInt(0), r.getInt(1)))
    require(rows.nonEmpty, s"PQ model at $path is empty")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * k &&
      rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
        (for (s <- 0 until m; c <- 0 until k) yield (s, c)),
      s"PQ model at $path is corrupted: (sub, cell) pairs do not tile " +
        s"[0, $m) x [0, $k)")
    val books = Vector.tabulate(m)(s => Vector.tabulate(k)(c =>
      rows(s * k + c).getSeq[Float](2).toArray))
    val dsub = books.head.head.length
    require(dsub > 0 && books.forall(_.forall(_.length == dsub)),
      s"PQ model at $path is corrupted: centroid sub-dimensionalities " +
        s"are not uniform")
    Model(books)
  }

  /** ADC (asymmetric distance computation) top-k: the query's m x k
    * sub-dot table is computed ONCE driver-side; each encoded row's
    * approximate dot product is `m` array lookups summed — map-only,
    * no vector reads, then TakeOrderedAndProject for the top-k (score
    * desc, id asc — total order, deterministic under ties). Downstream
    * re-scores the tiny candidate set exactly (q114's shape). */
  def searchAdc(
      encoded: DataFrame,
      idCol: String,
      codeCol: String,
      model: Model,
      query: Seq[Float],
      topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    require(query.length == model.m * model.dsub,
      s"query length ${query.length} != model dims ${model.m * model.dsub}")
    val lut: Seq[Seq[Double]] = (0 until model.m).map { s =>
      val qs = query.slice(s * model.dsub, (s + 1) * model.dsub)
      model.codebooks(s).map { c =>
        var d = 0.0; var i = 0
        while (i < c.length) { d += qs(i).toDouble * c(i).toDouble; i += 1 }
        d
      }
    }
    val score = (0 until model.m).map(s =>
      element_at(typedLit(lut(s)), col(codeCol).getItem(s) + 1))
      .reduce(_ + _)
    encoded.withColumn("adc_dot", score)
      .orderBy(desc("adc_dot"), col(idCol))
      .limit(topK)
  }

  /** IVF-PQ composed search — the production FAISS pairing: the IVF
    * cell prunes WHICH rows are scored (~(1 - nprobe/k) of the corpus
    * never read), the PQ codes prune WHAT is read per row (m bytes,
    * not the float vector). The index frame is the corpus after
    * [[Ivf.assign]] + [[encode]] — store it partitioned by the cell
    * column and the probe filter becomes partition pruning, so a
    * trillion-vector query touches nprobe/k of the files and scans
    * only codes. Cell ranking is [[Ivf.search]]'s driver-side order
    * verbatim ((-cos, cell) — a k-element computation); scoring within
    * the probed cells is [[searchAdc]]. Recall has two knobs, both
    * monotone: `nprobe` (cell recall) and the codebook resolution
    * (ranking fidelity) — q115 gates the composition end to end
    * against the exact top-k. */
  def searchIvfPq(
      indexed: DataFrame,
      idCol: String,
      cellCol: String,
      codeCol: String,
      ivf: Ivf.Model,
      pq: Model,
      query: Seq[Float],
      topK: Int,
      nprobe: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    require(nprobe > 0 && nprobe <= ivf.k,
      s"nprobe ($nprobe) must be in [1, ${ivf.k}]")
    val q = query.toArray
    val cells = ivf.centroids.zipWithIndex
      .map { case (c, i) => (Ivf.cosine(q, c), i) }
      .sortBy { case (cos, i) => (-cos, i) }
      .take(nprobe).map(_._2)
    searchAdc(indexed.filter(col(cellCol).isin(cells: _*)),
      idCol, codeCol, pq, query, topK)
  }
}
