package graft.canon

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema.{Membership, Statement, SuperEdge}

/**
 * Deterministic relation clustering — the reference's
 * `_generate_relation_jl` (/root/reference/update_kg/Updater.py:222-244):
 * relations with identical type and identical (role → argument
 * cluster) sets merge into one cluster; the group key is
 * `type + str(sorted([(pred, arg_cluster), ...]))`.
 *
 * We implement the FULL sorted-link-set semantics (the evident
 * intent). The reference has a quirk — its dict guard keeps only the
 * FIRST (pred, cluster) row per relation URI (`if rel_uri not in
 * rel_json`, Updater.py:228-233), silently truncating multi-argument
 * relations; we do not reproduce the truncation (SURVEY.md §7.4.5).
 *
 * In the transcript model a "relation instance" is a statement; its
 * arguments are the subj/obj clusters. The group key is therefore
 * (pred, subj_cluster, obj_cluster) serialized in sorted order —
 * matching the reference's canonicalized-argument-set identity.
 */
object RelationClusters {

  /** One row per (relation cluster, member statement): deterministic
    * cluster id + canonical group key + the member stmt_id, with the
    * cluster's member count on every row. ROW-SHAPED on purpose: a hot
    * relation cluster (hot entity family × hot predicate — guaranteed
    * under the synth's 30% skew at scale) must never accumulate one
    * unbounded member ARRAY in the pipeline output (the 2GB-row hazard
    * class); the reference's `.jl` line format needs the array only at
    * the sink — see [[graft.sources.SideFormats.writeRelationsJl]].
    *
    * `n_members` is a TWO-PHASE count joined back per row, NOT a
    * window count (which would shuffle and sort every member row of
    * the hot cluster into a single window task). The join-back is
    * merge-hinted like every other cluster-scale join here: its count
    * side is one row per relation cluster — corpus-growing, and size
    * ESTIMATES on checkpoint-descended frames undercount, so letting
    * Catalyst broadcast it is an OOM at contract scale; the sort-merge
    * join stays AQE skew-split-able (windows get no such skew
    * handling).
    *
    * TWO FORMS. The pipeline form takes the already-materialized
    * SuperEdge aggregate: its per-(subj_cluster, pred, obj_cluster)
    * `cnt` IS n_members (rel_key is a tagged injective encoding of
    * exactly that key), so the statements⋈memberships⋈memberships
    * subtree runs ONCE — the count side is a cheap scan of a stage
    * that exists anyway. The standalone form derives the counts by
    * re-aggregating `keyed`, which would plan the corpus-scale joins
    * twice — so it eagerly localCheckpoints `keyed` first (single
    * execution; the pinned blocks ride the returned frame's plan and
    * are released by the owner via [[graft.util.Blocks]], e.g.
    * Pipeline.Result.unpersist or SnapshotStore's post-write release). */
  def cluster(statements: Dataset[Statement], memberships: Dataset[Membership],
      superEdges: Dataset[SuperEdge]): DataFrame =
    clusterFromResolved(
      graft.superedge.SuperEdges.resolvedStatements(statements, memberships),
      superEdges)

  /** Pipeline form over a PRECOMPUTED (checkpointed) resolved-statement
    * join ([[graft.superedge.SuperEdges.resolvedStatements]]) — the
    * statements⋈memberships² subtree is shared with the superedge and
    * superedge-justification outputs instead of re-executing here
    * (guide-§2.4 shuffle removal; before/after in OPTIMIZATION_r06.md). */
  def clusterFromResolved(resolved: DataFrame,
      superEdges: Dataset[SuperEdge],
      broadcastCounts: Boolean = false): DataFrame =
    attachCounts(keyedFromResolved(resolved),
      superEdges.toDF().select(col("subj_proto").as("subj_cluster"),
        col("pred"), col("obj_proto").as("obj_cluster"),
        col("cnt").as("n_members")),
      broadcastCounts)

  /** Standalone form (no superedge stage available): `keyed` is
    * eagerly materialized so its two corpus-scale joins execute once
    * for both the count pass and the member rows. */
  def cluster(statements: Dataset[Statement],
      memberships: Dataset[Membership]): DataFrame = {
    val keyed = keyedStatements(statements, memberships).localCheckpoint(true)
    attachCounts(keyed,
      keyed.groupBy(col("pred"), col("subj_cluster"), col("obj_cluster"))
        .agg(count(lit(1)).as("n_members")))
  }

  /** Statements with their argument clusters resolved and the
    * canonical sorted-link-set group key attached (lazy). */
  private[graft] def keyedStatements(statements: Dataset[Statement],
      memberships: Dataset[Membership]): DataFrame =
    keyedFromResolved(
      graft.superedge.SuperEdges.resolvedStatements(statements, memberships))

  /** The canonical sorted-link-set group key over an already-resolved
    * statement frame (lazy; no joins of its own). */
  private[graft] def keyedFromResolved(resolved: DataFrame): DataFrame =
    resolved
      .withColumn("rel_key",
        concat_ws("|", col("pred"),
          array_join(array_sort(array(
            concat(lit("subj:"), col("subj_cluster")),
            concat(lit("obj:"), col("obj_cluster")))), ",")))

  /** `broadcastCounts`: the caller MEASURED the count side (one row
    * per relation cluster) under the broadcast gate — an explicit
    * broadcast then spares the member rows the shuffle+sort entirely
    * (guide §3.1); the default stays the always-safe merge join
    * because the count side is corpus-growing and checkpoint-descended
    * size ESTIMATES undercount (the compile-time-broadcast hazard). */
  private def attachCounts(keyed: DataFrame, counts: DataFrame,
      broadcastCounts: Boolean = false): DataFrame =
    keyed
      .join(if (broadcastCounts) broadcast(counts) else counts.hint("merge"),
        Seq("pred", "subj_cluster", "obj_cluster"))
      .withColumn("relation_cluster_id", concat(lit("rc:"), md5(col("rel_key"))))
      .select(col("relation_cluster_id"), col("rel_key"),
        col("stmt_id"), col("n_members"))

  /** Per-cluster summary (one row per relation cluster, no member
    * arrays) — the reporting shape. */
  def summary(clusterRows: DataFrame): DataFrame =
    clusterRows.groupBy(col("relation_cluster_id"), col("rel_key"))
      .agg(count(lit(1)).as("n_members"))
}
