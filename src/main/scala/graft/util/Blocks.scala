package graft.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Block-level lifecycle helpers for `localCheckpoint`ed frames.
 *
 * `Dataset.localCheckpoint` pins its materialized partitions via
 * `RDD.persist`, and `Dataset.unpersist` does NOT release them (it
 * only clears CacheManager entries) — the blocks survive until the
 * RDD object is garbage-collected. Long sessions that run many
 * pipelines therefore accumulate pinned blocks unless the owner
 * releases them explicitly (the pathology quantified in BASELINE.md
 * "persist weather": a later run's allocation burst against a heap
 * full of dead checkpoint blocks showed 19× executor time).
 *
 * These helpers find the checkpoint-scan leaves ([[LogicalRDD]]) in a
 * frame's analyzed plan and unpersist their RDDs. After `release` the
 * frame (and anything derived from it) is UNUSABLE — checkpointing
 * truncated the lineage, so the dropped blocks cannot be recomputed.
 * Call only when done with every consumer.
 */
object Blocks {

  /** The RDDs pinned by localCheckpoint scans in this frame's plan. */
  def pinned(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }

  /** Drop the pinned blocks behind this frame (non-blocking). The
    * frame must not be used afterwards. */
  def release(df: DataFrame): Unit =
    pinned(df).foreach(_.unpersist(blocking = false))

  /** Release every distinct pinned RDD across a set of frames once. */
  def releaseAll(dfs: Seq[DataFrame]): Unit =
    dfs.flatMap(pinned).distinctBy(_.id).foreach(_.unpersist(blocking = false))

  /** Release `df`'s pinned blocks EXCEPT those also reachable from
    * `keep` — for dropping a dead intermediate whose plan shares
    * checkpoint leaves with still-live frames. */
  def releaseExcept(df: DataFrame, keep: Seq[DataFrame]): Unit = {
    val live = keep.flatMap(pinned).map(_.id).toSet
    pinned(df).filterNot(r => live(r.id)).foreach(_.unpersist(blocking = false))
  }
}
