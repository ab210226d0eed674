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
      kes: Dataset[MentionExtractor.TurnKEs],
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

    val kes = MentionExtractor.extract(turns).persist(StorageLevel.MEMORY_AND_DISK)
    val mentions = kes.flatMap(_.mentions).persist(StorageLevel.MEMORY_AND_DISK)
    val statements = kes.flatMap(_.statements)
    val errors = kes.filter(_.error != null).select(col("error"))

    val (surf, edges) = Linker.matchEdges(mentions, linkCfg) // surf persisted inside
    val comp = ConnectedComponents.run(edges.toDF())
    val surfClusters = Canonicalizer
      .withKind(Canonicalizer.surfaceClusters(surf, comp))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val memberships = Canonicalizer.memberships(mentions, surfClusters)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val prototypes = Canonicalizer.prototypes(mentions, surfClusters)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val superEdges = SuperEdges.superEdges(statements, memberships)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val triples = SuperEdges.namedTriples(superEdges, prototypes)

    Result(kes, mentions, statements, errors, surf, comp, surfClusters,
      memberships, prototypes, superEdges, triples)
  }
}
