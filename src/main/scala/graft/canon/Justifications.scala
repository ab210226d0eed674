package graft.canon

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.{Membership, Mention}

/**
 * Cluster-level justification/link aggregation — the reference's
 * run_all steps 7-8 (/root/reference/update_kg/Updater.py:246-256 and
 * the pandas fallback :360-521).
 *
 * A3 — informative justification: the best justification per
 * (cluster, source doc). The reference has TWO semantics: the SPARQL
 * path takes max over the justification IRI STRING (an admitted
 * workaround, update_kg/sparqls.py:244-270), the Python path takes
 * max CONFIDENCE per doc (update_kg/Updater.py:368-377). We implement
 * the confidence semantics as primary (documented divergence,
 * SURVEY.md §7.4.1) and expose the IRI-max variant for parity tests.
 *
 * A4 — cluster links: best confidence per (cluster, link target)
 * (update_kg/sparqls.py:273-299; Python twin Updater.py:497-507).
 *
 * Both are single window/groupBy passes over the membership join —
 * partial aggregation absorbs hot clusters.
 */
object Justifications {

  /** A3, confidence semantics: one row per (cluster, conv) — the
    * member justification with max conf; ties broken by mention_id
    * (deterministic). */
  def informativeJustifications(memberships: Dataset[Membership],
      mentions: Dataset[Mention]): DataFrame = {
    // membership carries its own constant `conf`; keep only the keys so
    // the mention-level conf is unambiguous
    val j = memberships.toDF().select(col("cluster_id"), col("member_id"))
      .join(mentions.toDF().withColumnRenamed("mention_id", "member_id"), "member_id")
    val w = Window.partitionBy(col("cluster_id"), col("conv_id"))
      .orderBy(col("conf").desc, col("member_id").asc)
    j.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("conv_id"), col("member_id"),
        col("turn_idx"), col("start_off"), col("end_off"), col("conf"))
  }

  /** A3, reference-SPARQL IRI-max variant: max over the member id
    * string (update_kg/sparqls.py:258-268) — kept for parity tests. */
  def informativeJustificationsIriMax(memberships: Dataset[Membership],
      mentions: Dataset[Mention]): DataFrame = {
    val j = memberships.toDF().select(col("cluster_id"), col("member_id"))
      .join(mentions.toDF().withColumnRenamed("mention_id", "member_id"), "member_id")
    j.groupBy(col("cluster_id"), col("conv_id"))
      .agg(max(col("member_id")).as("member_id"))
  }

  /** A4: best link confidence per (cluster, link target); NILs
    * excluded (DUMMY semantics). */
  def clusterLinks(memberships: Dataset[Membership],
      mentions: Dataset[Mention]): DataFrame =
    memberships.toDF().select(col("cluster_id"), col("member_id"))
      .join(mentions.toDF().withColumnRenamed("mention_id", "member_id"), "member_id")
      .filter(col("link_target").isNotNull)
      .groupBy(col("cluster_id"), col("link_target"))
      .agg(max(col("conf")).as("link_cv"))

  /** P9: deterministic DUMMY link synthesis for NIL mentions — the
    * reference's global counter (json_head/get_json_head.py:10,18-20)
    * replaced by a content hash so re-runs emit identical links
    * (SURVEY.md §7.4 determinism). DUMMYs never block-match. */
  def withDummyLinks(mentions: DataFrame): DataFrame =
    mentions.withColumn("link_target",
      coalesce(col("link_target"),
        concat(lit("DUMMY:"), md5(col("mention_id")))))
}
