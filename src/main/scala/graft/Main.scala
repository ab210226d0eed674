package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.Canonicalizer
import graft.cc.ConnectedComponents
import graft.extract.MentionExtractor
import graft.link.Linker
import graft.schema._
import graft.snapshot.SnapshotStore
import graft.superedge.SuperEdges
import graft.synth.TranscriptSynth

/**
 * spark-submit entry point: full KG construction with snapshot-per-
 * stage checkpoint/resume — the north-rule contract ("resumable from
 * Iceberg-snapshot checkpoints with per-partition lineage and counter
 * metrics") realized over [[SnapshotStore]].
 *
 * Usage:
 *   spark-submit --class graft.Main <jar> \
 *     --input <transcripts parquet dir | synth:<nTurns>> \
 *     --output <snapshot root> [--threshold 0.65] [--dedup 0.9] \
 *     [--strip-boilerplate <minConvs>]
 *
 * Each stage is materialized as an immutable snapshot with per-
 * partition row counts in the manifest; a re-run resumes from the
 * last completed stage (the reference's user-selected step-range
 * restartability, /root/reference/update_kg/update_kg.py:17-35, made
 * automatic). Stage list mirrors Updater.run_all order (SURVEY §3.1).
 */
object Main {

  def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) => k.stripPrefix("--") -> v }.toMap

  def loadTurns(spark: SparkSession, input: String): Dataset[Turn] = {
    import spark.implicits._
    if (input.startsWith("synth:")) {
      val n = input.stripPrefix("synth:").toLong
      TranscriptSynth.turnsDs(spark,
        TranscriptSynth.Config(nConvs = (n / 10).toInt, turnsPerConv = 10))
    } else if (input.startsWith("synthdup:")) {
      // synth corpus + every 3rd conversation RE-INGESTED under a fresh
      // id (the ResumeSpec planting at CLI scale): with --dedup on, the
      // KG must come out identical to the clean `synth:` corpus
      val n = input.stripPrefix("synthdup:").toLong
      val base = TranscriptSynth.turnsDs(spark,
        TranscriptSynth.Config(nConvs = (n / 10).toInt, turnsPerConv = 10))
      base.unionByName(
        base.filter(t => t.conv_id.drop(4).toLong % 3 == 0)
          .map(t => t.copy(conv_id = t.conv_id + "-reingest")))
    } else if (input.startsWith("synthbp:")) {
      // synth corpus + an identical trigger-bearing system-prompt turn
      // appended to EVERY conversation (the serving-stack boilerplate
      // regime): with --strip-boilerplate on, the KG must come out
      // identical to the clean `synth:` corpus
      val n = input.stripPrefix("synthbp:").toLong
      val cfg = TranscriptSynth.Config(nConvs = (n / 10).toInt, turnsPerConv = 10)
      val base = TranscriptSynth.turnsDs(spark, cfg)
      base.unionByName(
        base.filter(_.turn_idx == 0).map(t => t.copy(
          turn_idx = cfg.turnsPerConv, role = "system",
          text = "Zorblatt Industries founded Quuxware Labs.")))
    } else spark.read.parquet(input).as[Turn]
  }

  /** The tagged-union KE extraction frame over `turns` — the same
    * single-flatMap shape Pipeline.run uses, exposed so the batch
    * ([[runResumable]]) and streaming
    * ([[graft.streaming.IncrementalKg]]) faces extract identically. */
  def extractKe(turns: Dataset[Turn]): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.flatMap { t =>
      val k = MentionExtractor.extractTurn(t)
      k.mentions.iterator.map(m => (1, m, null: Statement, null: EventArg, null: String)).toSeq ++
        k.statements.iterator.map(s => (2, null: Mention, s, null: EventArg, null: String)) ++
        k.events.iterator.map(m => (4, m, null: Statement, null: EventArg, null: String)) ++
        k.eventArgs.iterator.map(a => (5, null: Mention, null: Statement, a, null: String)) ++
        (if (k.error != null)
           Seq((3, null: Mention, null: Statement, null: EventArg, k.error))
         else Nil)
    }.toDF("tag", "m", "s", "a", "error")
  }

  /** Run all stages through the store; returns the triple count.
    * `inputId` identifies the input corpus; together with the linker
    * config it forms each stage's snapshot fingerprint, so a rerun
    * with a different input or threshold recomputes instead of
    * resuming stale snapshots. */
  def runResumable(spark: SparkSession, turns: Dataset[Turn],
      store: SnapshotStore, linkCfg: Linker.Config = Linker.Config(),
      inputId: String = "", dedupJaccard: Option[Double] = None,
      stripBoilerplateMinConvs: Option[Long] = None): Long = {
    val fp = s"input=$inputId|threshold=${linkCfg.threshold}" +
      s"|maxBlock=${linkCfg.maxBlock}|minTokenLen=${linkCfg.minTokenLen}" +
      s"|dedup=${dedupJaccard.getOrElse("off")}" +
      s"|strip=${stripBoilerplateMinConvs.getOrElse("off")}"

    // optional TURN-level boilerplate strip FIRST (cheapest filter,
    // and it sharpens the conversation near-dup signatures below by
    // removing the templated turns they would otherwise collide on):
    // the inventory of repeated turn texts is its own snapshot stage
    // (tiny — distinct boilerplate norms), the filter an anti-join.
    val turnsStripped = stripBoilerplateMinConvs match {
      case Some(k) =>
        val norms = store.getOrCreate(spark, "boilerplate_norms", fp) {
          graft.ops.Clean.boilerplateTurnNorms(turns, k)
        }
        graft.ops.Clean.stripTurnsByNorms(turns, norms)
      case None => turns
    }

    // optional conversation-level near-dup filter BEFORE extraction —
    // the 100TB training-data flow: re-ingested/trivially-reworded
    // transcripts are dropped while one canonical copy survives. Its
    // verdict rows are a snapshot stage like any other (resume-safe;
    // the fingerprint carries the threshold so toggling recomputes).
    val turnsIn = dedupJaccard match {
      case Some(thr) =>
        val verdicts = store.getOrCreate(spark, "dedup_canon", fp) {
          graft.ops.ConversationDedup.conversationClusters(turnsStripped, thr)
        }
        graft.ops.ConversationDedup.canonicalTurns(turnsStripped, verdicts)
      case None => turnsStripped
    }

    val ke = store.getOrCreate(spark, "ke", fp)(extractKe(turnsIn))
    kgStages(spark, ke, store, fp, linkCfg)
  }

  /** Every stage DOWNSTREAM of extraction, from the tagged KE frame to
    * the triples — shared verbatim by the batch resume path (ke = one
    * snapshot of the whole corpus) and the streaming incremental path
    * (ke = the union of the append-log's delta snapshots; the caller
    * keys `fp` to the log head so advancing the log recomputes and an
    * idempotent re-fire resumes). Returns the triple count. */
  def kgStages(spark: SparkSession, ke: DataFrame, store: SnapshotStore,
      fp: String, linkCfg: Linker.Config): Long = {
    import spark.implicits._
    val mentions = ke.filter(col("tag") === 1).select(col("m.*")).as[Mention]
    val statements = ke.filter(col("tag") === 2).select(col("s.*")).as[Statement]
    val events = ke.filter(col("tag") === 4).select(col("m.*")).as[Mention]
    val eventArgs = ke.filter(col("tag") === 5).select(col("a.*"))

    val surf = store.getOrCreate(spark, "surfaces", fp)(Linker.surfaces(mentions))
    val edges = store.getOrCreate(spark, "match_edges", fp) {
      // reuse the surfaces snapshot instead of recomputing it
      Linker.matchEdgesFrom(surf, linkCfg).toDF()
    }
    val comp = store.getOrCreate(spark, "components", fp)(ConnectedComponents.run(edges))
    val surfClusters = store.getOrCreate(spark, "surface_clusters", fp) {
      Canonicalizer.withKind(Canonicalizer.surfaceClusters(surf, comp))
    }
    // the same dictionary-size gate Pipeline.run applies: broadcast
    // hints only while the surface dictionary fits the broadcast
    // threshold; above it, salted (memberships) / un-hinted shuffle
    // (prototypes) paths
    val dictFits = surfClusters.count() <= Pipeline.SaltedMembershipRows
    val memberships = store.getOrCreate(spark, "memberships", fp) {
      (if (dictFits) Canonicalizer.memberships(mentions, surfClusters)
       else Canonicalizer.membershipsSalted(mentions, surfClusters)).toDF()
    }.as[Membership]
    val prototypes = store.getOrCreate(spark, "prototypes", fp) {
      Canonicalizer.prototypes(mentions, surfClusters, broadcastDict = dictFits).toDF()
    }.as[Prototype]
    val superEdges = store.getOrCreate(spark, "superedges", fp) {
      SuperEdges.superEdges(statements, memberships).toDF()
    }.as[SuperEdge]
    val triples = store.getOrCreate(spark, "triples", fp) {
      SuperEdges.namedTriples(superEdges, prototypes).toDF()
    }
    // event coreference (the reference's aida:Event cluster kind,
    // Updater.py:133) — after entity clustering, arguments resolve at
    // cluster level
    val eventClusters = store.getOrCreate(spark, "event_clusters", fp) {
      graft.canon.EventCoref.keyedEvents(events, eventArgs, memberships)
    }
    store.getOrCreate(spark, "event_prototypes", fp) {
      graft.canon.EventCoref.prototypes(eventClusters).toDF()
    }
    store.getOrCreate(spark, "event_cluster_justifications", fp) {
      // same informative-justification rule, third cluster kind: event
      // members are mentions with trigger spans
      graft.canon.Justifications.informativeJustifications(
        graft.canon.EventCoref.memberships(eventClusters), events)
    }
    // relation clusters + justification/link aggregation + copy-backs
    // (reference run_all steps 6-8 and the proto/superedge
    // justification inserts, Updater.py:222-256, sparqls.py:391-527)
    store.getOrCreate(spark, "relation_clusters", fp) {
      // superedge-count reuse: n_members comes from the superedges
      // snapshot, so the statements⋈memberships² joins run once
      graft.canon.RelationClusters.cluster(statements, memberships, superEdges)
    }
    store.getOrCreate(spark, "cluster_justifications", fp) {
      graft.canon.Justifications.informativeJustifications(memberships, mentions)
    }
    store.getOrCreate(spark, "cluster_links", fp) {
      graft.canon.Justifications.clusterLinks(memberships, mentions)
    }
    store.getOrCreate(spark, "proto_justifications", fp) {
      graft.canon.Justifications.prototypeJustifications(memberships, mentions, prototypes)
    }
    // the two remaining reference copy-backs (proto_inf_just /
    // proto_type_assertion_justi, sparqls.py:413-454) — emitted, not
    // just implemented
    store.getOrCreate(spark, "proto_inf_justifications", fp) {
      graft.canon.Justifications.prototypeInformativeJustifications(
        memberships, mentions, prototypes)
    }
    store.getOrCreate(spark, "proto_type_justifications", fp) {
      graft.canon.Justifications.prototypeTypeAssertionJustifications(
        memberships, mentions, prototypes)
    }
    store.getOrCreate(spark, "superedge_justifications", fp) {
      graft.canon.Justifications.superEdgeJustifications(statements, memberships)
    }
    triples.count()
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val input = opts.getOrElse("input", "synth:100000")
    val output = opts.getOrElse("output", "/tmp/graft-kg")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // under spark-submit the master comes from the launcher; standalone
    // dev runs fall back to a tuned local session
    val session =
      if (sys.props.contains("spark.master"))
        SparkSession.builder()
          .config("spark.sql.extensions", "graft.functions.GraftExtensions")
          .getOrCreate()
      else Sessions.local(cores)
    val store = new SnapshotStore(output)
    val cfg = Linker.Config(threshold =
      opts.getOrElse("threshold", "0.65").toDouble)
    // --dedup <jaccard>: drop near-duplicate conversations (one
    // canonical survivor per family) before extraction
    val dedup = opts.get("dedup").map(_.toDouble)
    // --strip-boilerplate <minConvs>: drop turns whose normalized text
    // repeats across ≥ minConvs conversations (system prompts, tool
    // banners) before everything else
    val strip = opts.get("strip-boilerplate").map(_.toLong)
    val n = runResumable(session, loadTurns(session, input), store, cfg,
      inputId = input, dedupJaccard = dedup, stripBoilerplateMinConvs = strip)
    println(s"""{"triples":$n,"output":"$output","stages":${store.manifestEntries().size}}""")
  }
}
