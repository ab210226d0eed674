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
    // node declarations carry the reference's type coloring + tooltips
    // (dot_utils.py node_color; RPI_cluster_event_include_dot.py:27-34)
    assert(dot.contains("fillcolor=\"#1f77b4\"") || dot.contains("fillcolor=\"#9467bd\"")
      || dot.contains("fillcolor=\"#e377c2\""), s"no typed node colors in:\n$dot")
    assert(dot.contains("tooltip=\""), "no node tooltips in dot render")
    assert(dot.contains("style=\"filled\""))
  }

  test("clusterSources sample stays bounded on a hot cluster, identical output") {
    import spark.implicits._
    import graft.schema.{Membership, Mention}
    // one cluster spanning 100k conversations — the unbounded
    // collect_set formulation materialized all of them in one row;
    // the rank-gated one aggregates ≤ sampleK strings
    val n = 100000
    val mentions = spark.range(n).map { i =>
      Mention(s"m$i", f"conv$i%07d", 0, "entity", "PER", "X", "x", 0, 1, 0.9, null)
    }
    val ms = spark.range(n).map(i => Membership("cHot", s"m$i", 1.0))
    val out = Stats.clusterSources(ms, mentions).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == n)
    val sample = out.head.getString(2).split(", ")
    assert(sample.length == 20)
    // deterministic: the 20 smallest conv ids, sorted
    assert(sample.toSeq == (0 until 20).map(i => f"conv$i%07d"))
  }

  test("nested cluster entity tree matches the reference rank-report shape") {
    import spark.implicits._
    import graft.schema.{Membership, Mention}
    def m(id: String, etype: String, name: String, link: String) =
      Mention(id, "d1", 0, "entity", etype, name, name, 0, 1, 0.9, link)
    val mentions = Seq(
      m("m1", "PER", "John Smith", null),
      m("m2", "PER", "John Smith", null),
      m("m3", "PER", "J. Smith", null),
      m("m4", "GPE", "Paris", "kb:GPE7"),
      m("m5", "ORG", null, null)).toDS()
    val ms = Seq(
      Membership("c1", "m1", 1.0), Membership("c1", "m2", 1.0),
      Membership("c1", "m3", 1.0), Membership("c1", "m4", 1.0),
      Membership("c2", "m5", 1.0)).toDS()
    val rows = Stats.clusterEntityTree(ms, mentions).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("c1", "c2")) // ranked by cnt desc
    assert(rows.head.getLong(1) == 4)
    val e1 = rows.head.getString(2)
    // nested {type → {link|others → {name → count}}}, keys sorted
    assert(e1 ==
      """{"GPE":{"kb:GPE7":{"Paris":1}},"PER":{"others":{"J. Smith":1,"John Smith":2}}}""")
    assert(rows(1).getString(2) == """{"ORG":{"others":{"NO_NAME":1}}}""")
    // topNames bounds the leaf fan-out
    val capped = Stats.clusterEntityTree(ms, mentions, topNames = 1)
      .collect().head.getString(2)
    assert(capped.contains(""""John Smith":2"""))
    assert(!capped.contains("J. Smith"))
    // json dump round-trips
    val dir = java.nio.file.Files.createTempDirectory("tree").toString + "/out"
    Stats.writeClusterEntityTreeJson(Stats.clusterEntityTree(ms, mentions), dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    assert(lines.length == 2)
    assert(lines.head.startsWith("""{"cluster_uri":"c1","cnt":4,"entities":{"""))
  }
}
