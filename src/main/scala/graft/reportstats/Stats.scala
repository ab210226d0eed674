package graft.reportstats

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema._

/**
 * Reporting/statistics operators over the KG tables — the Spark
 * re-realization of the reference's ClusterReport / statistics
 * programs (SURVEY.md §3.3):
 *  - type counts (A1, /root/reference/update_kg/statistics.py:17-28)
 *  - cluster sizes + ranked dump (A2/W1/W3,
 *    ClusterReport.py:42-53, json_head/get_statistics.py:58-96)
 *  - distinct source docs per cluster (A8,
 *    RPI_cluster_seedling_dot.py:33-43)
 *  - comma-joined distinct sources (A9, ClusterReport.py:84-99) —
 *    sorted before joining so output is deterministic
 *  - superedge report: count + avg confidence ordered desc (A6/A7/W1,
 *    RPI_cluster_seedling_report.py:42-71)
 *  - grouped subject→{pred:[objs]} documents (A10, rdf2json.py:17-29)
 */
object Stats {

  /** A1: counts per KE kind over mentions + cluster/membership counts. */
  def typeCounts(mentions: Dataset[Mention], clusters: DataFrame,
      memberships: Dataset[Membership]): DataFrame = {
    val m = mentions.toDF().groupBy(col("kind")).agg(count(lit(1)).as("cnt"))
    val c = clusters.agg(count(lit(1)).as("cnt"))
      .select(lit("SameAsCluster").as("kind"), col("cnt"))
    val ms = memberships.toDF().agg(count(lit(1)).as("cnt"))
      .select(lit("ClusterMembership").as("kind"), col("cnt"))
    m.unionByName(c).unionByName(ms)
  }

  /** A2 + W1/W3: cluster sizes, ranked, optional top-k. */
  def clusterSizes(memberships: Dataset[Membership], topK: Int = 0): DataFrame = {
    val sizes = memberships.toDF().groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("cluster_id").asc)
    if (topK > 0) sizes.limit(topK) else sizes
  }

  /** A8 + A9: distinct source conversations per cluster, with a
    * deterministic comma-joined sample. */
  def clusterSources(memberships: Dataset[Membership],
      mentions: Dataset[Mention]): DataFrame =
    memberships.toDF()
      .join(mentions.toDF().select(col("mention_id").as("member_id"), col("conv_id")),
        "member_id")
      .groupBy(col("cluster_id"))
      .agg(
        countDistinct(col("conv_id")).as("n_docs"),
        array_join(slice(array_sort(collect_set(col("conv_id"))), 1, 20), ", ")
          .as("docs_sample"))

  /** A6/A7/W1: superedge report with names, ordered by count desc. */
  def superEdgeReport(superEdges: Dataset[SuperEdge],
      prototypes: Dataset[Prototype]): DataFrame = {
    val names = prototypes.toDF().select(col("cluster_id"), col("name"))
    superEdges.toDF()
      .join(names.withColumnRenamed("cluster_id", "subj_proto")
        .withColumnRenamed("name", "subj_name"), "subj_proto")
      .join(names.withColumnRenamed("cluster_id", "obj_proto")
        .withColumnRenamed("name", "obj_name"), "obj_proto")
      .select(col("subj_name"), col("pred"), col("obj_name"),
        col("cnt"), col("conf"))
      .orderBy(col("cnt").desc, col("subj_name").asc, col("pred").asc,
        col("obj_name").asc)
  }

  /** A10: group triples into subject documents {pred → [objs]} —
    * deterministic (objs sorted). */
  def subjectDocuments(triples: Dataset[Triple]): DataFrame =
    triples.toDF()
      .groupBy(col("subj"), col("pred"))
      .agg(array_sort(collect_set(col("obj"))).as("objs"))
      .groupBy(col("subj"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("pred"), col("objs")))))
        .as("doc"))

  /** Observable per-stage row counters — the reference's progress
    * counters (update_kg/Updater.py:152) as Spark observable metrics;
    * read the value from a QueryExecutionListener or
    * df.observe-returned observation. */
  def withRowCounter(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))

  /** Graphviz dot source for the top-k superedge report — the
    * reference's cluster graph renders (RPI_cluster_seedling_dot.py,
    * dot_utils.py:37-45). Driver-side formatting over a collected
    * top-k, like the reference; label wrap at `wrap` chars
    * (utils.py:60-71 analog). */
  def dotGraph(report: DataFrame, topK: Int = 50, wrap: Int = 24): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def wrapLabel(s: String): String =
      s.split(' ').foldLeft(List("")) { (acc, w) =>
        if (acc.head.isEmpty) w :: acc.tail
        else if (acc.head.length + 1 + w.length <= wrap) (acc.head + " " + w) :: acc.tail
        else w :: acc
      }.reverse.mkString("\\n")
    val rows = report.limit(topK).collect()
    val sb = new StringBuilder("digraph kg {\n  rankdir=LR;\n  node [shape=box];\n")
    rows.foreach { r =>
      val s = esc(wrapLabel(r.getAs[String]("subj_name")))
      val o = esc(wrapLabel(r.getAs[String]("obj_name")))
      val p = esc(r.getAs[String]("pred"))
      val cnt = r.getAs[Long]("cnt")
      sb.append(s"""  "$s" -> "$o" [label="$p (x$cnt)"];\n""")
    }
    sb.append("}\n").toString
  }
}
