package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Checkpoint bookkeeping for the iterative operators (q57/q69/q82).
  *
  * `localCheckpoint` persists its backing RDD OUTSIDE the catalog cache
  * manager, so iterative loops must free superseded rounds themselves.
  * Earlier rounds did that by diffing `getPersistentRDDs` snapshots
  * around each checkpoint — fragile under concurrency: an RDD persisted
  * by ANY other query on the shared context between the two snapshots
  * lands in the diff and is unpersisted by the next round's cleanup.
  * This helper instead reads the checkpoint's exact backing RDD out of
  * the returned plan (its `LogicalRDD` scan node), so cleanup can only
  * ever touch the RDD it created — safe under however many concurrent
  * queries share the session.
  */
private[graft] object Iterative {

  /** `df.localCheckpoint()` plus the exact persisted RDD backing it.
    *
    * `eager = false` defers materialization to the CALLER's next action
    * on the returned frame — the caller promises to run one (q57 runs
    * its convergence probe, which reads every partition via `count`, so
    * probe + checkpoint share a single job instead of paying one each;
    * Spark's `LocalRDDCheckpointData` self-heals any partition a
    * partial action missed). Leaving the frame action-less would leak
    * nothing (release still unpersists) but would silently recompute
    * the lineage on every downstream read.
    */
  def checkpointed(df: DataFrame, eager: Boolean = true): (DataFrame, RDD[_]) = {
    val out = df.localCheckpoint(eager)
    val backing = out.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }
    // fail loudly if a Spark upgrade changes the checkpoint plan shape —
    // silently returning nothing would leak one RDD per iteration
    require(backing.nonEmpty,
      "localCheckpoint plan has no LogicalRDD scan node")
    (out, backing.head)
  }

  def release(rdd: RDD[_]): Unit = rdd.unpersist(blocking = false)
}
