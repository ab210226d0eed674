package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.canon.Canonicalizer
import graft.cc.ConnectedComponents
import graft.extract.MentionExtractor
import graft.link.Linker
import graft.schema._
import graft.superedge.SuperEdges

/**
 * End-to-end KG construction over transcripts — the Spark-native
 * re-realization of the reference's `Updater.run_all` stage order
 * (/root/reference/update_kg/Updater.py:584-598, SURVEY.md §3.1):
 * extract (TA1 analog) → link (gaia-clustering analog) → connected
 * components → canonicalize (clusters/prototypes/singletons) →
 * superedges → corpus triples.
 *
 * Every stage is a pure Dataset→Dataset transform; stage boundaries
 * are plain DataFrames so callers can snapshot/resume between them
 * (graft.snapshot). Where the reference round-trips HTTP per 1000
 * triples, ours crosses machines only at Spark shuffles.
 */
object Pipeline {

  final case class Result(
      mentions: Dataset[Mention],
      statements: Dataset[Statement],
      errors: DataFrame,
      surfaces: DataFrame,
      components: DataFrame,
      surfaceClusters: DataFrame,
      memberships: Dataset[Membership],
      prototypes: Dataset[Prototype],
      superEdges: Dataset[SuperEdge],
      triples: Dataset[Triple])

  def run(turns: Dataset[Turn], linkCfg: Linker.Config = Linker.Config()): Result = {
    val spark = turns.sparkSession
    import spark.implicits._

    // Stage boundaries are MATERIALIZED (eager localCheckpoint), not
    // merely cached: persist keeps the full logical plan, so every
    // downstream action re-analyzes/re-optimizes a tree that grows
    // with each stage (profiling showed driver planning + nested
    // encode/decode dominating, not data work). Checkpointing is also
    // the in-session analog of the snapshot-per-stage design the
    // reference's step-resumable pipeline implies (SURVEY.md §3.1,
    // §4.3.5) — on a cluster these boundaries are SnapshotStore
    // parquet snapshots.
    // ONE extraction pass emitting a flat tagged row per KE; mentions/
    // statements/errors are then carved out with columnar filter+
    // project (no object round-trip, no second extraction pass, no
    // nested Seq cache).
    val ke = turns.flatMap { t =>
      val k = MentionExtractor.extractTurn(t)
      val ms = k.mentions.iterator.map(m => (1, m, null: Statement, null: String))
      val ss = k.statements.iterator.map(s => (2, null: Mention, s, null: String))
      val es = if (k.error != null) Iterator((3, null: Mention, null: Statement, k.error))
               else Iterator.empty
      (ms ++ ss ++ es).toSeq
    }.toDF("tag", "m", "s", "error").localCheckpoint(true)
    val mentions = ke.filter(col("tag") === 1).select(col("m.*")).as[Mention]
    val statements = ke.filter(col("tag") === 2).select(col("s.*")).as[Statement]
    val errors = ke.filter(col("tag") === 3).select(col("error"))

    val (surf, edges) = Linker.matchEdges(mentions, linkCfg) // surf checkpointed inside
    val comp = ConnectedComponents.run(edges.toDF())
    val surfClusters = Canonicalizer
      .withKind(Canonicalizer.surfaceClusters(surf, comp))
      .localCheckpoint(true)

    val memberships = Canonicalizer.memberships(mentions, surfClusters)
      .localCheckpoint(true)
    val prototypes = Canonicalizer.prototypes(mentions, surfClusters)
      .localCheckpoint(true)
    val superEdges = SuperEdges.superEdges(statements, memberships)
      .localCheckpoint(true)
    val triples = SuperEdges.namedTriples(superEdges, prototypes)

    Result(mentions, statements, errors, surf, comp, surfClusters,
      memberships, prototypes, superEdges, triples)
  }
}
