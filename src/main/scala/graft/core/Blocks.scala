package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `Dataset.localCheckpoint()` storage.
  *
  * `Dataset.unpersist` does NOT free an eager local checkpoint: the
  * checkpointed RDD is persisted at the RDD level, outside the SQL
  * CacheManager that `Dataset.unpersist` operates on, so the call is a
  * silent no-op and the blocks survive until the ContextCleaner happens to
  * GC the RDD object (verified empirically: `unpersist(blocking = true)`
  * leaves the block registered; dropping the reference + `System.gc()`
  * clears it). Loops that must bound block-manager storage — streaming
  * foreachBatch, index append loops, the components fixpoint — cannot rely
  * on GC timing: the week-long-uptime soak measured a residue of
  * never-collected checkpoint blocks and a peak of several batches'
  * worth of storage coexisting. [[free]] releases the underlying
  * checkpoint RDD directly, which is immediate and deterministic. */
object Blocks {

  /** Release the checkpoint blocks of `df` (a `localCheckpoint()` result)
    * now. Safe on any Dataset: plans without a checkpointed leaf are left
    * untouched. */
  def free(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
