package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Explicit release of the executor blocks a CONSUMED frame pins.
  *
  * Operators that materialize intermediate state into the block manager
  * (`localCheckpoint` in [[Components]] and the two-pass RDD operators
  * [[General.withContiguousRowIds]]/[[General.withRunningTotal]],
  * `persist` in [[Ivf]] training) necessarily return frames whose PLAN
  * reads those blocks — the operator itself cannot release them. Spark
  * frees them only when the driver GCs the RDD handle and the
  * ContextCleaner notices, which in a long-lived session (a service, a
  * notebook, a bench harness) can be minutes-to-never: dead blocks
  * compound into block-manager and disk pressure that slows every job
  * AFTER the one that made them. This utility is the deterministic
  * counterpart — call it the moment a frame is fully consumed.
  */
object Blocks {

  /** Unpersist every persisted RDD reachable from `df`'s RDD-backed
    * leaves. Walks the analyzed plan for `LogicalRDD` leaves (the shape
    * both `localCheckpoint` results and `createDataFrame(rdd, schema)`
    * frames analyze to), then walks each leaf RDD's dependency graph so
    * a checkpointed RDD sitting BEHIND a derived leaf — the sorted
    * checkpoint under [[General.withContiguousRowIds]]'s id-attaching
    * `mapPartitionsWithIndex`, for example — is found and freed too.
    *
    * Contract: after release the frame CANNOT be recomputed (an
    * unpersisted local checkpoint has no lineage to rebuild from), so
    * this must only run on a frame whose every consumer has already
    * executed. Safe to call on frames with no RDD-backed state at all
    * (pure parquet-scan plans): it finds nothing and does nothing.
    *
    * Shared-lineage hazard: the walk frees every persisted RDD the
    * frame's plan REACHES, including checkpoints shared with OTHER
    * still-live frames derived from the same intermediate — two frames
    * built over one [[General.withContiguousRowIds]] result share its
    * checkpoint, and releasing either breaks the other with Spark's
    * cannot-recompute error. Release only after ALL frames descending
    * from the shared intermediate are consumed, not just this one — or
    * use [[releaseExcept]] to free a consumed sibling while explicitly
    * keeping every block the survivors still reach. */
  def release(df: DataFrame): Unit = {
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(rdd: RDD[_]): Unit = if (seen.add(rdd.id)) {
      if (rdd.getStorageLevel != StorageLevel.NONE)
        rdd.unpersist(blocking = false)
      rdd.dependencies.foreach(d => walk(d.rdd))
    }
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
      .foreach(walk)
  }

  /** [[release]] minus the blocks any `live` frame still needs: frees
    * every persisted RDD reachable from `df` EXCEPT those also
    * reachable from a frame in `live` — the API form of the
    * shared-lineage hazard documented on [[release]]. Two frames built
    * over one [[General.withContiguousRowIds]] intermediate share its
    * checkpoint; `release(first)` would kill the second with Spark's
    * cannot-recompute error, while `releaseExcept(first, Seq(second))`
    * frees only what the first owns outright and leaves every shared
    * block for the survivors. When the last sibling is consumed, a
    * plain [[release]] on it frees the shared remainder.
    *
    * The ownership computation is driver-side plan/RDD-graph walking
    * only (no jobs, no data movement), so calling it per consumed frame
    * in a long pipeline costs microseconds. */
  def releaseExcept(df: DataFrame, live: Seq[DataFrame]): Unit = {
    val keep = scala.collection.mutable.Set.empty[Int]
    def mark(rdd: RDD[_]): Unit = if (keep.add(rdd.id))
      rdd.dependencies.foreach(d => mark(d.rdd))
    live.foreach(_.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
      .foreach(mark))
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(rdd: RDD[_]): Unit = if (seen.add(rdd.id)) {
      if (rdd.getStorageLevel != StorageLevel.NONE && !keep.contains(rdd.id))
        rdd.unpersist(blocking = false)
      rdd.dependencies.foreach(d => walk(d.rdd))
    }
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
      .foreach(walk)
  }

  /** Loan pattern over [[release]]: hand `df` to `use`, then release
    * its blocks no matter how `use` exits. `use` must fully CONSUME the
    * frame (run its actions — aggregate, write, collect) before
    * returning; returning a lazy plan that still reads `df` violates
    * the contract and fails later with Spark's cannot-recompute error.
    * [[release]]'s shared-lineage hazard applies equally: sibling
    * frames over the same checkpointed intermediate die with it. */
  def consuming[T](df: DataFrame)(use: DataFrame => T): T =
    try use(df) finally release(df)
}
