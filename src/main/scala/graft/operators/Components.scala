package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIR detection ([[Dedup.minHashNearDupPairs]],
  * [[Dedup.simHashNearDupPairsW]], [[Similarity.lshCosineNearDupPairs]])
  * into duplicate GROUPS, so a dedup pipeline can keep exactly one
  * survivor per group (`groupBy(comp).agg(min(id))`).
  *
  * Algorithm: iterative min-label propagation, DataFrame-native — each
  * node's label becomes the minimum of its own and its neighbors'
  * labels until a fixpoint. One hash join + one map-side-combined
  * aggregation per iteration; converges in at most the graph diameter
  * iterations (near-dup clusters are near-cliques, so typically 1-3).
  * For graphs with long chains at extreme scale, the alternating
  * star-contraction formulation (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14) converges in O(log^2 n) rounds —
  * the same per-round join shape, so it drops in here if diameter ever
  * becomes the bottleneck.
  *
  * Iterative-lineage discipline: the symmetrized edge frame is
  * `localCheckpoint`ed ONCE up front, and each iteration
  * `localCheckpoint`s the new label frame (eagerly). The edge
  * checkpoint matters most: exchange reuse never crosses separate
  * actions, so without it every iteration's `sym.join(labels)` would
  * re-execute the caller's entire upstream pipeline — for a dedup flow
  * that is the full MinHash-LSH pair detection, multiplied by the
  * iteration count. The pair graph is sparse and bounded (near-dup
  * pairs, not the corpus), which is exactly the frame a checkpoint is
  * for. The label checkpoint truncates the per-iteration plan —
  * without it the lineage doubles per iteration and the job dies in
  * the optimizer long before it dies in execution — and makes the
  * convergence check (a scan of the already-materialized frame) cost
  * no recompute.
  */
object Components {

  /** (node, comp) for every node appearing in `edges`, where `comp` is
    * the minimum node id reachable from the node. Deterministic.
    * Fails loudly if `maxIters` is hit before the fixpoint (raise
    * `maxIters` for graphs with diameter > 25 — or switch to star
    * contraction; silent partial clustering would merge/split dedup
    * groups unpredictably). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIters: Int = 25): DataFrame = {
    require(maxIters > 0)
    val sym = edges.select(col(srcCol).as("node"), col(dstCol).as("nb"))
      .unionByName(edges.select(col(dstCol).as("node"), col(srcCol).as("nb")))
      .distinct()
      .localCheckpoint() // materialize edges ONCE; iterations read blocks
    var labels = sym.select("node").distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbMin = sym
        .join(labels.select(col("node").as("nb"), col("comp").as("nb_comp")), "nb")
        .groupBy("node").agg(min("nb_comp").as("nb_min"))
      val joined = labels
        .join(nbMin, Seq("node"), "left")
        .select(col("node"), col("comp").as("__old"),
          least(col("comp"), coalesce(col("nb_min"), col("comp"))).as("comp"))
        .localCheckpoint()
      converged = joined.filter(col("comp") < col("__old")).isEmpty
      labels = joined.select("node", "comp") // reads the checkpoint, plan stays 1-node
      it += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxIters iterations " +
        "(graph diameter exceeds the bound); raise maxIters")
    labels
  }
}
