package graft.reportstats

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
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
    * deterministic comma-joined sample of the first `sampleK` (sorted).
    * BOUNDED row size AND bounded per-task work — two hazards, two
    * defenses:
    *  - the sample is rank-gated BEFORE collection, so a hot cluster
    *    spanning 10^8 conversations aggregates ≤ sampleK strings per
    *    group, never the full distinct set in one row (2GB-row hazard);
    *  - the rank window is SALTED: partitioning a window on cluster_id
    *    alone would funnel every distinct conv of the hot cluster into
    *    ONE task to sort (the hot-key window hazard) — instead each
    *    (cluster, salt) shard ranks its own ≤ n/salts convs and keeps
    *    its own top sampleK, and the final per-cluster merge sorts only
    *    ≤ salts × sampleK survivors. Per-salt counts sum exactly (the
    *    upstream distinct makes shards disjoint), so `n_docs` is exact.
    */
  def clusterSources(memberships: Dataset[Membership],
      mentions: Dataset[Mention], sampleK: Int = 20, salts: Int = 16): DataFrame = {
    val distinctDocs = memberships.toDF()
      .join(mentions.toDF().select(col("mention_id").as("member_id"), col("conv_id")),
        "member_id")
      // null conv_id must not count toward n_docs (countDistinct
      // semantics of the pre-rank-gated formulation: nulls excluded)
      .filter(col("conv_id").isNotNull)
      .select(col("cluster_id"), col("conv_id"))
      .distinct()
      .withColumn("_salt", pmod(xxhash64(col("conv_id")), lit(salts.toLong)))
    val w = Window.partitionBy(col("cluster_id"), col("_salt"))
      .orderBy(col("conv_id").asc)
    distinctDocs
      .withColumn("rn", row_number().over(w))
      .groupBy(col("cluster_id"), col("_salt"))
      .agg(
        count(lit(1)).as("n"),
        collect_list(when(col("rn") <= sampleK, col("conv_id"))).as("sample"))
      .groupBy(col("cluster_id"))
      .agg(
        sum(col("n")).as("n_docs"),
        array_join(
          slice(array_sort(flatten(collect_list(col("sample")))), 1, sampleK),
          ", ").as("docs_sample"))
  }

  /** A6/A7/W1: superedge report with names (+ node types for the dot
    * render's coloring), ordered by count desc. */
  def superEdgeReport(superEdges: Dataset[SuperEdge],
      prototypes: Dataset[Prototype]): DataFrame = {
    val names = prototypes.toDF().select(col("cluster_id"), col("name"), col("etype"))
    superEdges.toDF()
      .join(names.withColumnRenamed("cluster_id", "subj_proto")
        .withColumnRenamed("name", "subj_name")
        .withColumnRenamed("etype", "subj_etype"), "subj_proto")
      .join(names.withColumnRenamed("cluster_id", "obj_proto")
        .withColumnRenamed("name", "obj_name")
        .withColumnRenamed("etype", "obj_etype"), "obj_proto")
      .select(col("subj_name"), col("pred"), col("obj_name"),
        col("cnt"), col("conf"), col("subj_etype"), col("obj_etype"))
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

  /** The nested per-cluster statistics tree — the reference's
    * ta1/ta2 cluster rank report (json_head/get_statistics.py:58-96):
    * one row per cluster, ranked by member count desc, carrying
    * `entities` = {type → {link | 'others' → {name → count}}}. The
    * reference keys on a link only when it is a real KB id (its
    * `m.`-prefix Freebase test); our KB ids carry the `kb:` prefix —
    * same rule, different namespace. Unnamed members count under
    * NO_NAME (update_cur, get_statistics.py:15-27).
    *
    * Scale: three groupBy levels with strictly shrinking key
    * cardinality; the only per-row arrays are the nested maps, which
    * are bounded by `topNames` distinct names per (cluster,type,link)
    * leaf (rank-gated BEFORE collection; 0 = unbounded, reference
    * fidelity for report-sized corpora — the cap is the documented
    * divergence that keeps a hot cluster from materializing millions
    * of distinct typo'd names in one row). */
  def clusterEntityTree(memberships: Dataset[Membership],
      mentions: Dataset[Mention], topNames: Int = 50,
      kbPrefix: String = "kb:"): DataFrame = {
    val base = memberships.toDF().select(col("cluster_id"), col("member_id"))
      .join(mentions.toDF().select(col("mention_id").as("member_id"),
        col("etype"), col("name"), col("link_target")), "member_id")
      .select(col("cluster_id"), col("etype"),
        when(col("link_target").startsWith(kbPrefix), col("link_target"))
          .otherwise(lit("others")).as("link"),
        coalesce(nullif(col("name"), lit("")), lit("NO_NAME")).as("name"))
    val counts = base
      .groupBy(col("cluster_id"), col("etype"), col("link"), col("name"))
      .agg(count(lit(1)).as("cnt"))
    val leafW = Window.partitionBy(col("cluster_id"), col("etype"), col("link"))
      .orderBy(col("cnt").desc, col("name").asc)
    val gated =
      if (topNames > 0)
        counts.withColumn("rn", row_number().over(leafW))
          .filter(col("rn") <= topNames).drop("rn")
      else counts
    // nested JSON built bottom-up: names (arbitrary text) are escaped
    // by to_json at the leaf; link/type keys are controlled vocabulary
    // (etype constants, kb: ids, 'others') so plain quoting is safe.
    // array_sort before every join keeps entry order deterministic.
    def obj(entries: Column): Column =
      concat(lit("{"), array_join(entries, ","), lit("}"))
    val byLink = gated
      .groupBy(col("cluster_id"), col("etype"), col("link"))
      .agg(to_json(map_from_entries(array_sort(
          collect_list(struct(col("name"), col("cnt")))))).as("names_json"),
        sum(col("cnt")).as("cnt"))
    val byType = byLink
      .groupBy(col("cluster_id"), col("etype"))
      .agg(obj(transform(
          array_sort(collect_list(struct(col("link"), col("names_json")))),
          s => concat(lit("\""), s.getField("link"), lit("\":"),
            s.getField("names_json")))).as("links_json"),
        sum(col("cnt")).as("cnt"))
    byType
      .groupBy(col("cluster_id"))
      .agg(obj(transform(
          array_sort(collect_list(struct(col("etype"), col("links_json")))),
          s => concat(lit("\""), s.getField("etype"), lit("\":"),
            s.getField("links_json")))).as("entities"),
        sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("cluster_id").asc)
      .select(col("cluster_id"), col("cnt"), col("entities"))
  }

  /** [[clusterEntityTree]] rendered as the reference's ranked JSON
    * dump (one object per line, rank order preserved via the sorted
    * write of a single-partition report — report-sized output). The
    * pre-built nested `entities` JSON is spliced in unquoted. */
  def writeClusterEntityTreeJson(tree: DataFrame, path: String): Unit =
    tree.coalesce(1).sortWithinPartitions(col("cnt").desc, col("cluster_id").asc)
      .select(concat(
        to_json(struct(col("cluster_id").as("cluster_uri"), col("cnt")))
          .substr(lit(1), length(to_json(struct(col("cluster_id").as("cluster_uri"), col("cnt")))) - 1),
        lit(",\"entities\":"), col("entities"), lit("}")).as("value"))
      .write.mode("overwrite").text(path)

  /** Observable per-stage row counters — the reference's progress
    * counters (update_kg/Updater.py:152) as Spark observable metrics;
    * read the value from a QueryExecutionListener or
    * df.observe-returned observation. */
  def withRowCounter(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))

  /** Node fill colors by entity type — the reference's palette
    * (dot_utils.py:1-15; unknown types get the same teal default). */
  private val typeColor = Map(
    "Facility" -> "#7f7f7f",
    "GeopoliticalEntity" -> "#e377c2",
    "Location" -> "#8c564b",
    "Organization" -> "#9467bd",
    "Person" -> "#1f77b4",
    "FillerType" -> "#ff7f0e")
  private val defaultColor = "#17becf"

  /** Graphviz dot source for the top-k superedge report — the
    * reference's cluster graph renders (RPI_cluster_seedling_dot.py,
    * RPI_cluster_event_include_dot.py:27-34, dot_utils.py:1-45):
    * filled nodes colored by entity type with a type tooltip, labeled
    * edges. Driver-side formatting over a collected top-k, like the
    * reference; label wrap at `wrap` chars (utils.py:60-71 analog).
    * Type columns (subj_etype/obj_etype) are optional — reports
    * without them render uncolored boxes. */
  def dotGraph(report: DataFrame, topK: Int = 50, wrap: Int = 24): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def wrapLabel(s: String): String =
      s.split(' ').foldLeft(List("")) { (acc, w) =>
        if (acc.head.isEmpty) w :: acc.tail
        else if (acc.head.length + 1 + w.length <= wrap) (acc.head + " " + w) :: acc.tail
        else w :: acc
      }.reverse.mkString("\\n")
    val hasTypes = report.columns.contains("subj_etype")
    val rows = report.limit(topK).collect()
    val sb = new StringBuilder(
      "digraph kg {\n  rankdir=LR;\n  node [shape=box, style=\"filled\"];\n")
    if (hasTypes) {
      // one declaration per distinct node: fill color + tooltip by type
      val nodes = rows.flatMap { r =>
        Seq(r.getAs[String]("subj_name") -> r.getAs[String]("subj_etype"),
          r.getAs[String]("obj_name") -> r.getAs[String]("obj_etype"))
      }.distinct
      nodes.foreach { case (name, etype) =>
        val c = typeColor.getOrElse(etype, defaultColor)
        sb.append(s"""  "${esc(wrapLabel(name))}" [tooltip="${esc(etype)}",""" +
          s""" fillcolor="$c", color="$c"];\n""")
      }
    }
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
