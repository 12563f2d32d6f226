package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Actually releases the storage behind a checkpointed frame.
  *
  * `Dataset.unpersist` only removes the CacheManager entry (plain
  * `.persist` caching); the RDD a `localCheckpoint` pinned is NOT touched —
  * verified on the bundled Spark 4.1.2: `sc.getPersistentRDDs` retains the
  * checkpoint RDD after `df.unpersist(true)`, and its blocks free only
  * when GC + ContextCleaner get around to the dereferenced RDD. Every
  * release path in this codebase that holds a directly-checkpointed frame
  * goes through [[release]], which unpersists BOTH layers.
  *
  * Deliberately shallow: only a frame whose ROOT plan node is the
  * checkpoint scan (i.e. the frame IS the localCheckpoint result) has its
  * RDD released. Matching nested LogicalRDDs would free storage shared
  * with sibling frames derived from the same checkpoint. */
object FrameBlocks {
  def release(df: DataFrame): Unit = {
    try { df.unpersist(); () } catch { case _: Throwable => () }
    try {
      df.queryExecution.analyzed match {
        case l: LogicalRDD => l.rdd.unpersist(false); ()
        case _ => ()
      }
    } catch { case _: Throwable => () }
  }
}
