package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the materialized RDD inside a localCheckpoint'ed Dataset.
  *
  * `Dataset.localCheckpoint()` persists an internal RDD and wraps it in a
  * LogicalRDD plan node; `Dataset.unpersist` is a CacheManager no-op for
  * it, and the only public handle back to its storage blocks is the
  * global `sc.getPersistentRDDs` registry. Round 3's q65 freed blocks by
  * DIFFING that registry between loop rounds — which would claim any RDD
  * another job on the shared session persisted concurrently (ADVICE r3,
  * medium: for a foreign localCheckpoint'ed RDD whose lineage is
  * truncated, a forced unpersist is unrecoverable task failure, not
  * recompute). This accessor returns the checkpoint RDD OF A SPECIFIC
  * frame, so cleanup can never touch anything else.
  */
object RddBridge {
  /** The checkpointed RDD backing `df`, if `df` is the direct result of
    * a (local)checkpoint — i.e. its analyzed plan is the LogicalRDD the
    * checkpoint produced. None for any other frame. */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Free the storage blocks of a checkpoint-backed frame (no-op for
    * anything else). Safe only once nothing will read the frame again:
    * the lineage is truncated, so this is destruction, not eviction. */
  def freeCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
}
