package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle registry for the materialized residue a query leaves behind.
  *
  * `Dataset.localCheckpoint()` parks its blocks in executor storage until
  * the driver GCs the Dataset AND the ContextCleaner notices — across
  * repeated invocations (a warm bench rerun, a long interactive session)
  * that is N stale snapshots of storage taxing every successor's memory
  * budget. `spark.catalog.clearCache()` frees plan-keyed cache entries but
  * NOT checkpoint RDDs, so the r9 bench measured warm-alone runs ~50%
  * SLOWER than cold for the checkpoint-heavy queries
  * (`pipeline_dedup_e2e` 4.7→7.1 s, `graph_common_neighbors` 4.6→7.0 s).
  *
  * The registry makes checkpoint lifetime explicit: a query registers its
  * checkpointed frame under a stable key; RE-ENTERING the same query frees
  * the previous invocation's blocks before building new ones, and a
  * session-level boundary (the bench's family hygiene, Verify's per-query
  * loop) calls [[freeAll]] to drop everything at once. On a 1000-executor
  * cluster the same discipline bounds iterative-job storage to ONE live
  * snapshot per operator instead of one per invocation. */
object Residue {
  private val held = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Eagerly localCheckpoint `df` and register it under `key`, freeing
    * whatever the previous invocation of this key left behind. */
  def swap(key: String, df: DataFrame): DataFrame =
    track(key, df.localCheckpoint())

  /** Register an already-materialized frame (e.g. the surviving label
    * frame of an iterative fixpoint) under `key`, freeing the previous
    * holder. The frame stays queryable until the NEXT swap/track on the
    * same key or a [[freeAll]]. */
  def track(key: String, cp: DataFrame): DataFrame = {
    free(key)
    held.put(key, cp)
    cp
  }

  /** Unpersist the checkpoint blocks registered under `key`, if any. */
  def free(key: String): Unit =
    Option(held.remove(key)).foreach(unpersistBlocks)

  /** Drop every registered frame — the query-family / session boundary. */
  def freeAll(): Unit = {
    val keys = held.keys()
    while (keys.hasMoreElements) free(keys.nextElement())
  }

  private def unpersistBlocks(df: DataFrame): Unit =
    // defensive: a frame registered by a since-stopped SparkContext (a
    // bench session handing over to the alone lane) must not make the
    // NEXT session's free()/swap() throw — dead contexts hold no blocks
    try df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    } catch { case _: Throwable => () }
}
