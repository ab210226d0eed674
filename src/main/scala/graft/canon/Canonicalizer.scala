package graft.canon

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.{Membership, Mention, Prototype}

/**
 * Cluster canonicalization: component → SameAsCluster + prototype.
 *
 * Reference semantics re-realized (SURVEY.md §2.4-2.5):
 *  - singleton synthesis: every surface not covered by a match edge
 *    becomes its own cluster (set-difference anti-join, J6 —
 *    /root/reference/update_kg/Updater.py:172-201); here expressed as
 *    a left-outer join + coalesce(component, sid), which is the same
 *    anti-join fused with the assignment.
 *  - deterministic IDs: cluster/prototype ids are md5 of the minimal
 *    member surface key, replacing the reference's
 *    `members[0]-cluster-<random10>` minting
 *    (update_kg/Updater.py:156-158,190; determinism per SURVEY §7.4).
 *  - prototype name/type = mode over members with max-tiebreak — the
 *    reference's 3-level nested subquery proto_name/proto_type
 *    (update_kg/sparqls.py:302-388) collapsed into one groupBy + one
 *    window argmax (A5).
 *  - membership confidence constant 1.0 (update_kg/Updater.py:565).
 *
 * Scale notes: the only mention-scale shuffle is the single
 * groupBy(cluster, name, etype, link) pre-aggregation; every mode is
 * then derived from that compact table. Hot clusters (skewed names)
 * are absorbed by partial aggregation (map-side combine) before the
 * shuffle.
 */
object Canonicalizer {

  /** Surface → cluster assignment with singleton synthesis.
    * Output: surf columns + cluster_id, prototype_id. */
  def surfaceClusters(surf: DataFrame, comp: DataFrame): DataFrame = {
    val withComp = surf
      .join(comp, Seq("sid"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("sid")))
    // deterministic representative: minimal surface key in the component
    val reps = withComp.groupBy(col("component")).agg(min(col("skey")).as("repkey"))
    withComp.join(reps, "component")
      .withColumn("cluster_id", concat(lit("c:"), md5(col("repkey"))))
      .withColumn("prototype_id", concat(lit("p:"), md5(col("repkey"))))
      .drop("repkey")
  }

  /** Mention-level memberships (conf = 1.0, reference constant). */
  def memberships(mentions: Dataset[Mention], surfClusters: DataFrame): Dataset[Membership] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    // EXPLICIT broadcast of the surface dictionary: left to its own
    // stats Catalyst picked BuildLeft here — broadcasting the
    // corpus-scale MENTIONS side and streaming the dictionary, which
    // (a) OOMs outright at scale and (b) leaves the output with the
    // dictionary's (often 1) partition, serializing the membership
    // checkpoint and every consumer's map side (profiled: one 136s
    // task). The auto-switch in Pipeline.run sends oversized
    // dictionaries to membershipsSalted instead, so the broadcast here
    // is always the small side.
    mentions.toDF()
      .join(
        broadcast(surfClusters.select(
          col("etype").as("s_etype"), col("norm_name").as("s_norm"),
          col("link_target").as("s_link"), col("cluster_id"))),
        col("etype") === col("s_etype") && col("norm_name") === col("s_norm") &&
          col("link_target") <=> col("s_link"))
      .select(col("cluster_id"), col("mention_id").as("member_id"),
        lit(1.0).as("conf"))
      .as[Membership]
  }

  /** Prototypes with mode-name / mode-type / mode-link and member
    * counts, computed from one compact (cluster, name, etype, link)
    * aggregate. */
  def prototypes(mentions: Dataset[Mention], surfClusters: DataFrame): Dataset[Prototype] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    // one mention-scale shuffle → compact per-cluster attribute counts.
    // broadcast the dictionary side explicitly (same BuildLeft hazard
    // as `memberships` — see the comment there)
    val attrCnt = mentions.toDF()
      .join(
        broadcast(surfClusters.select(
          col("etype").as("s_etype"), col("norm_name").as("s_norm"),
          col("link_target").as("s_link"), col("cluster_id"), col("prototype_id"),
          col("kind").as("s_kind"))),
        col("etype") === col("s_etype") && col("norm_name") === col("s_norm") &&
          col("link_target") <=> col("s_link"))
      .groupBy(col("cluster_id"), col("prototype_id"), col("s_kind"),
        col("name"), col("etype"), col("link_target"))
      .agg(count(lit(1)).as("cnt"))
      .persist()

    def mode(valueCol: String): DataFrame = {
      val byVal = attrCnt
        .filter(col(valueCol).isNotNull)
        .groupBy(col("cluster_id"), col(valueCol))
        .agg(sum(col("cnt")).as("n"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n").desc, col(valueCol).desc) // max-label tiebreak, A5
      byVal.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col(valueCol))
    }

    val base = attrCnt.groupBy(col("cluster_id"), col("prototype_id"), col("s_kind"))
      .agg(sum(col("cnt")).as("n_members"))
    val out = base
      .join(mode("name"), Seq("cluster_id"), "left_outer")
      .join(mode("etype"), Seq("cluster_id"), "left_outer")
      .join(mode("link_target"), Seq("cluster_id"), "left_outer")
      .select(col("prototype_id"), col("cluster_id"), col("s_kind").as("kind"),
        col("name"), col("etype"), col("link_target"), col("n_members"))
      .as[Prototype]
    out
  }

  /** Surface-level kind column for surfClusters. Surface clusters are
    * entity-kind BY CONSTRUCTION ([[graft.link.Linker.surfaces]]
    * filters kind="entity"); the reference's other two cluster kinds
    * have their own paths — events in [[EventCoref]] (kind="event"),
    * relations in [[RelationClusters]]. */
  def withKind(surfClusters: DataFrame): DataFrame =
    surfClusters.withColumn("kind", lit("entity"))

  /** Memberships via an EXPLICIT salted join — for deployments where
    * the surface dictionary exceeds the broadcast threshold and the
    * hot surface (one name in ~30% of turns) would otherwise land in
    * a single sort-merge partition (SURVEY.md §7.4.3; see
    * [[graft.link.SkewJoin]]). NILs are joined through a sentinel so
    * salting keeps null-safe-equality semantics. Result ≡
    * [[memberships]]. */
  def membershipsSalted(mentions: Dataset[Mention], surfClusters: DataFrame,
      salts: Int = 16): Dataset[Membership] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val sentinel = "\u0001nil"
    val large = mentions.toDF()
      .withColumn("lt", coalesce(col("link_target"), lit(sentinel)))
      .select(col("mention_id"), col("etype"), col("norm_name"), col("lt"))
    val small = surfClusters
      .select(col("etype"), col("norm_name"),
        coalesce(col("link_target"), lit(sentinel)).as("lt"), col("cluster_id"))
    graft.link.SkewJoin
      .salted(large, small, Seq("etype", "norm_name", "lt"), col("mention_id"), salts)
      .select(col("cluster_id"), col("mention_id").as("member_id"), lit(1.0).as("conf"))
      .as[Membership]
  }
}
