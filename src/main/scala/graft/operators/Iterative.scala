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

  /** `df.localCheckpoint()` plus the exact persisted RDD backing it. */
  def checkpointed(df: DataFrame): (DataFrame, RDD[_]) = {
    val out = df.localCheckpoint()
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
