package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative numeric graph kernels over edge lists — the authority/
  * importance side of graph analysis, complementing [[Components]]'
  * connectivity side. Same execution discipline: per-iteration frames
  * are locally checkpointed so iteration k+1 never re-executes the
  * upstream pipeline, and superseded checkpoints are released as the
  * loop advances.
  */
object Graph {

  /** Fixed-iteration PageRank over an edge list:
    * `r_{k+1}(v) = (1-damping)/N + damping * Σ_{u→v} r_k(u)/outdeg(u)`,
    * starting uniform at 1/N. Fixed iterations (not a convergence
    * test) keep the result a pure function of the inputs —
    * reproducible run-to-run and oracle-checkable.
    *
    * Node-set contract: ranks are defined over the DISTINCT SOURCES of
    * `edges`, so every ranked node has out-degree ≥ 1 and no mass is
    * lost to dangling nodes. Feed a SYMMETRIZED edge list (both
    * directions of each undirected pair — the near-dup-graph case, the
    * authority weighting of dedup clusters) and the contract holds by
    * construction; a directed graph with sinks needs dangling-mass
    * redistribution this variant deliberately omits.
    *
    * Scale shape: out-degrees ride the edge list through ONE
    * checkpointed (src, dst, outdeg) frame built up front; each
    * iteration is then one hash join (edges × ranks on src) and one
    * map-side-combined sum on dst — shuffle bounded by edges then
    * nodes, per iteration, like [[Components]]. The node count is the
    * single driver scalar. The returned frame reads its own
    * checkpoint: pass it to [[Blocks.release]] (or `consuming`) once
    * fully consumed. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations ($iterations) must be >= 1")
    require(damping > 0 && damping < 1, s"damping ($damping) must be in (0, 1)")
    // Checkpoint the RAW edges first: deg and the degree-carrying join
    // below each embed the edge plan again, so without this the
    // upstream pipeline (q96: the full MinHash pair verify) would
    // execute once per plan occurrence in the ew job instead of once
    // total.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("od"))
    // Edges carry the out-degree from here on: one join now instead of
    // one per iteration. Checkpointed — every iteration reads these
    // blocks; the raw-edge blocks are released right after.
    val ew = e.join(deg, "src").localCheckpoint()
    Blocks.release(e)
    val n = ew.select(col("src")).distinct().count().toDouble
    require(n > 0, "pageRank needs at least one edge")
    val teleport = (1.0 - damping) / n
    var ranks = ew.select(col("src").as("v")).distinct()
      .withColumn("r", lit(1.0 / n)).localCheckpoint()
    var i = 0
    while (i < iterations) {
      val stepped = ew.join(ranks, col("src") === col("v"))
        .groupBy(col("dst").as("dest"))
        .agg((lit(teleport) + lit(damping) * sum(col("r") / col("od"))).as("r2"))
        .select(col("dest").as("v"), col("r2").as("r"))
        .localCheckpoint() // eager: materialized before the old blocks go
      Blocks.release(ranks)
      ranks = stepped
      i += 1
    }
    // The final ranks checkpoint is self-contained; the edge frame's
    // blocks are dead weight from here.
    Blocks.release(ew)
    ranks
  }
}
