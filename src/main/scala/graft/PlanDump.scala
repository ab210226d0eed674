package graft

import java.io.{File, PrintWriter}

import graft.synth.TranscriptSynth

/**
 * Round-6 plan capture (guide §7.2): writes `.explain("formatted")`
 * of every declared query — and of the pipeline's output frames over
 * a small corpus — to one file per query under args(1). Dev tool for
 * the plans/r06/ before/after evidence; not part of the driver
 * contract.
 *
 * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [names...]
 */
object PlanDump {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Set[String] = args.drop(3).toSet
    new File(outDir).mkdirs()
    val spark = Sessions.local(8, "graft-plandump")

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val w = new PrintWriter(s"$outDir/${name}_$suffix.txt")
      try w.write(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
      println(s"dumped $name")
    }

    // the per-table declared queries (cheap to construct; explain only)
    val tableQueries = Seq(
      "q_count_by_type", "q_group_count", "q_argmax_per_group",
      "q_mode_tiebreak", "q_superedge_conf", "q_avg_conf",
      "q_count_distinct", "q_group_concat", "q_join_chain", "q_left_outer",
      "q_anti_join", "q_union", "q_intersect", "q_except", "q_two_hop",
      "q_distinct", "q_suffix", "q_prefix_bucket", "q_json_extract",
      "q_coalesce_pref", "q_substr_window", "q_regex_clean", "q_topk",
      "q_stable_turn_order", "q_dedup_exact", "q_token_count", "q_quality",
      "q_fingerprint", "q_langid", "q_wav_decode", "q_minhash_sigs",
      "q_simhash", "q_ngram_jaccard", "q_near_dup_groups",
      "q_boilerplate_lines", "q_strip_boilerplate", "q_repetition_ngrams",
      "q_pii_redact", "q_dedup_doc_lines", "q_ann_topk", "q_cosine_pairs",
      "q_cosine_pairs_lsh", "q_relation_clusters", "q_connected_components",
      "q_event_coref", "q_superedge_justif", "q_proto_justi", "q_inf_just")
    for (name <- tableQueries if only.isEmpty || only(name))
      try dump(name, SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable => println(s"skip $name: ${e.getMessage}") }

    // pipeline output frames over a small corpus (Pipeline.run
    // materializes its stage checkpoints; the frames below are the
    // lazy plans the bench forces)
    if (only.isEmpty || only("pipeline")) {
      val r = Pipeline.run(TranscriptSynth.turnsDs(spark,
        TranscriptSynth.Config(nConvs = 200, turnsPerConv = 8), partitions = 8))
      dump("pipe_triples", r.triples.toDF())
      dump("pipe_eventPrototypes", r.eventPrototypes.toDF())
      dump("pipe_relationClusters", r.relationClusters)
      dump("pipe_informativeJustifications", r.informativeJustifications)
      dump("pipe_clusterLinks", r.clusterLinks)
      dump("pipe_protoJustifications", r.protoJustifications)
      dump("pipe_superEdgeJustifications", r.superEdgeJustifications)
      r.unpersist()
    }
    spark.stop()
  }
}
