package graft.canon

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema.{Membership, Statement}

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

  /** One row per relation cluster: deterministic cluster id + member
    * statement ids + the canonical group key. */
  def cluster(statements: Dataset[Statement],
      memberships: Dataset[Membership]): DataFrame = {
    val m = memberships.toDF()
    val withClusters = statements.toDF()
      .join(m.select(col("member_id").as("subj"), col("cluster_id").as("subj_cluster")), "subj")
      .join(m.select(col("member_id").as("obj"), col("cluster_id").as("obj_cluster")), "obj")
    val keyed = withClusters.withColumn("rel_key",
      concat_ws("|", col("pred"),
        array_join(array_sort(array(
          concat(lit("subj:"), col("subj_cluster")),
          concat(lit("obj:"), col("obj_cluster")))), ",")))
    keyed.groupBy(col("rel_key"))
      .agg(
        sort_array(collect_set(col("stmt_id"))).as("member_stmts"),
        count(lit(1)).as("n_members"))
      .withColumn("relation_cluster_id", concat(lit("rc:"), md5(col("rel_key"))))
      .select(col("relation_cluster_id"), col("rel_key"),
        col("member_stmts"), col("n_members"))
  }
}
