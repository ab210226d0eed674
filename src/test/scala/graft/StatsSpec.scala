package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.reportstats.Stats
import graft.synth.TranscriptSynth

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("report operators over a pipeline result") {
    val cfg = TranscriptSynth.Config(nConvs = 60, turnsPerConv = 8)
    val r = Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = 4))
    val clustersDf = r.prototypes.toDF().select("cluster_id", "prototype_id", "kind")

    val tc = Stats.typeCounts(r.mentions, clustersDf, r.memberships)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tc("entity") == r.mentions.count())
    assert(tc("ClusterMembership") == r.memberships.count())
    assert(tc("SameAsCluster") == r.prototypes.count())

    val sizes = Stats.clusterSizes(r.memberships, topK = 5).collect()
    assert(sizes.length == 5)
    assert(sizes.map(_.getLong(1)).toSeq == sizes.map(_.getLong(1)).toSeq.sorted.reverse)
    // hot-skew family dominates the top cluster
    assert(sizes.head.getLong(1) > sizes.last.getLong(1))

    val srcs = Stats.clusterSources(r.memberships, r.mentions).collect()
    assert(srcs.nonEmpty)
    assert(srcs.forall(_.getLong(1) >= 1))

    val rep = Stats.superEdgeReport(r.superEdges, r.prototypes).collect()
    assert(rep.length == r.superEdges.count())
    assert(rep.map(_.getLong(3)).toSeq == rep.map(_.getLong(3)).toSeq.sorted.reverse)

    val docs = Stats.subjectDocuments(r.triples).collect()
    assert(docs.length == r.triples.select("subj").distinct().count())

    val dot = Stats.dotGraph(Stats.superEdgeReport(r.superEdges, r.prototypes), topK = 10)
    assert(dot.startsWith("digraph kg {"))
    assert(dot.linesIterator.count(_.contains("->")) == 10)
  }
}
