package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.Membership

/**
 * The reference pipeline's side-file formats as Spark sources/sinks
 * (SURVEY.md §1.3, §2.1 S5/S7/S8):
 *
 *  - `.jl` cluster files: one JSON array of member ids per line
 *    (write: /root/reference/update_kg/Updater.py:240-244, read:
 *    :149-159) — the clustering interface format;
 *  - informative-justification CSV (Updater.py:360-487) with sparse
 *    modality columns and the NaN→0 bbox rule (P13, :462-465);
 *  - links CSV (Updater.py:489-507).
 */
object SideFormats {

  /** Write memberships as reference `.jl`: one JSON array of member
    * ids per cluster per line (cluster id itself is not part of the
    * format — the reference mints ids on load). Deterministic: members
    * sorted, one output line per cluster. */
  def writeClustersJl(memberships: Dataset[Membership], path: String): Unit =
    memberships.toDF()
      .groupBy(col("cluster_id"))
      .agg(sort_array(collect_set(col("member_id"))).as("members"))
      .select(to_json(col("members")).as("value"))
      .write.mode("overwrite").text(path)

  /** Read a `.jl` cluster file → (cluster_idx snapshot-local, member).
    * Mirrors Updater.py:149-159's line-at-a-time parse, distributed. */
  def readClustersJl(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"), ArrayType(StringType)).as("members"))
      .withColumn("cluster_key", md5(to_json(sort_array(col("members")))))
      .select(col("cluster_key"), explode(col("members")).as("member_id"))

  /** Write relation-cluster member rows
    * ([[graft.canon.RelationClusters.cluster]] shape) as reference
    * `.jl`: one JSON array of member statement ids per cluster per
    * line (Updater.py:240-244). The member ARRAY exists only here, at
    * the sink, scoped to one output line — the pipeline carries rows
    * (no unbounded collect_set on a skewable relation key upstream). */
  def writeRelationsJl(clusterRows: DataFrame, path: String): Unit =
    clusterRows
      .groupBy(col("relation_cluster_id"))
      .agg(sort_array(collect_set(col("stmt_id"))).as("members"))
      .select(to_json(col("members")).as("value"))
      .write.mode("overwrite").text(path)

  /** Informative-justification CSV schema (sparse by modality). */
  val infJustSchema: StructType = StructType(Seq(
    StructField("entity", StringType), StructField("just_type", StringType),
    StructField("just_doc", StringType), StructField("just_source", StringType),
    StructField("just_confidence_value", DoubleType),
    StructField("so", IntegerType), StructField("eo", IntegerType),
    StructField("kfid", StringType),
    StructField("ulx", DoubleType), StructField("uly", DoubleType),
    StructField("lrx", DoubleType), StructField("lry", DoubleType),
    StructField("sid", StringType), StructField("st", StringType),
    StructField("et", StringType)))

  /** Read ij CSV with the reference's NaN→0 bbox coercion (P13,
    * Updater.py:462-465) applied to image bounding boxes. */
  def readInfJustCsv(spark: SparkSession, path: String): DataFrame = {
    def z(c: String) = coalesce(nanvl(col(c), lit(0.0)), lit(0.0)).cast("int").as(c)
    spark.read.schema(infJustSchema).option("header", "true").csv(path)
      .withColumns(Map(
        "ulx" -> z("ulx"), "uly" -> z("uly"), "lrx" -> z("lrx"), "lry" -> z("lry")))
  }

  /** json-head `entity.json` analog
    * (/root/reference/json_head/get_json_head.py:12-30: ent_uri →
    * [name, type, linkTarget], NIL → DUMMY counter): one JSON object
    * per line — the distributed form of the reference's single dict
    * (a driver-side dict collect would not scale; `cat` of the part
    * files is the dict's entry set). DUMMY links are deterministic
    * content hashes, not a global counter (SURVEY.md §7.4). */
  def writeEntityJson(mentions: DataFrame, path: String): Unit =
    graft.canon.Justifications.withDummyLinks(mentions)
      .select(to_json(struct(
        col("mention_id").as("entity"), col("name"),
        col("etype").as("type"), col("link_target").as("link"))).as("value"))
      .write.mode("overwrite").text(path)

  /** json-head `cluster.json` analog (get_json_head.py:33-46:
    * cluster_uri → [[members], [prototypes]]): one line per cluster. */
  def writeClusterJson(memberships: Dataset[Membership],
      prototypes: DataFrame, path: String): Unit =
    memberships.toDF()
      .groupBy(col("cluster_id"))
      .agg(sort_array(collect_set(col("member_id"))).as("members"))
      .join(prototypes.select(col("cluster_id"), col("prototype_id")), "cluster_id")
      .select(to_json(struct(col("cluster_id"), col("members"),
        array(col("prototype_id")).as("prototypes"))).as("value"))
      .write.mode("overwrite").text(path)

  /** json-head `event.json` analog (get_json_head.py:49-61: evt_uri →
    * {type, doc, text[], entities[]}): one line per event mention. */
  def writeEventJson(events: DataFrame, eventArgs: DataFrame, path: String): Unit =
    events
      .select(col("mention_id").as("event_id"), col("etype").as("type"),
        col("conv_id").as("doc"), col("name"))
      .join(eventArgs.groupBy(col("event_id"))
        .agg(sort_array(collect_set(col("arg_id"))).as("entities")),
        Seq("event_id"), "left_outer")
      .select(to_json(struct(col("event_id"), col("type"), col("doc"),
        array(col("name")).as("text"),
        coalesce(col("entities"), array()).as("entities"))).as("value"))
      .write.mode("overwrite").text(path)

  /** Links CSV: entity, link_target, link_cv (Updater.py:489-507). */
  val linksSchema: StructType = StructType(Seq(
    StructField("entity", StringType), StructField("link_target", StringType),
    StructField("link_cv", DoubleType)))

  def readLinksCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(linksSchema).option("header", "true").csv(path)
}
