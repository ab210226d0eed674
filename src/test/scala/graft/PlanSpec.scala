package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that matter at 100 TB must be
  * visible in explain() — predicate pushdown to the parquet scan,
  * column pruning, broadcast choice for small dimensions. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push down to the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") === 42L)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_orderkey"),
      s"no pushdown in: $scan")
  }

  test("column pruning reaches the scan (ReadSchema only has selected cols)") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("l_orderkey") && scan.contains("l_quantity"))
    assert(!scan.contains("l_extendedprice"), s"scan reads pruned col: $scan")
  }

  test("join chain broadcasts small dimension tables") {
    val df = SparkEntry.queries("q_join_chain")(spark, dir)
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in plan")
  }

  test("extraction stage plans no shuffle") {
    import spark.implicits._
    val turns = graft.synth.TranscriptSynth.turnsDs(spark,
      graft.synth.TranscriptSynth.Config(nConvs = 5, turnsPerConv = 4))
    val mentions = graft.extract.MentionExtractor.extract(turns).flatMap(_.mentions)
    val plan = mentions.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in extraction: $plan")
  }

  test("linker surface-id assignment is a pure projection (no RDD, no sort)") {
    import spark.implicits._
    val turns = graft.synth.TranscriptSynth.turnsDs(spark,
      graft.synth.TranscriptSynth.Config(nConvs = 10, turnsPerConv = 4))
    val mentions = graft.extract.MentionExtractor.extract(turns)
      .flatMap(_.mentions)
    val surf = graft.link.Linker.surfaces(mentions)
    val plan = surf.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan ExistingRDD"),
      s"RDD round-trip in surfaces plan: $plan")
    assert(!plan.contains("Sort "), s"global sort in surfaces plan: $plan")
  }

  test("minhash signatures plan has no shuffle (per-row fold, no explode/groupBy)") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f"), (2L, "g h i j k l")).toDF("doc_id", "text")
    val plan = graft.ops.Dedup.minHashSignatures(d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in minhash plan: $plan")
  }

  test("membership join broadcasts the surface dictionary when small") {
    import spark.implicits._
    val turns = graft.synth.TranscriptSynth.turnsDs(spark,
      graft.synth.TranscriptSynth.Config(nConvs = 40, turnsPerConv = 6))
    val r = Pipeline.run(turns)
    // r.memberships is checkpointed (its plan is just the checkpoint
    // scan); audit the JOIN plan by rebuilding it over the
    // checkpointed inputs
    val join = graft.canon.Canonicalizer.memberships(r.mentions, r.surfaceClusters)
    join.count() // let AQE finalize
    val plan = join.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small surface dict not broadcast: $plan")
    // the SIDE matters as much as the strategy: stats once led Catalyst
    // to BuildLeft — broadcasting corpus-scale MENTIONS and streaming
    // the 1-partition dictionary, which serializes the membership
    // checkpoint (one 136s task profiled) and OOMs at scale. The
    // dictionary is the right/build side; output partitioning must be
    // the mention side's.
    assert(plan.contains("BuildRight"),
      s"membership join builds the mention side (BuildLeft): $plan")
    assert(join.rdd.getNumPartitions > 1,
      "membership output collapsed to the dictionary's single partition")
  }

  test("event coreference plans no cartesian product") {
    import spark.implicits._
    val turns = graft.synth.TranscriptSynth.turnsDs(spark,
      graft.synth.TranscriptSynth.Config(nConvs = 40, turnsPerConv = 6))
    val r = Pipeline.run(turns)
    val plan = r.eventPrototypes.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in event coref: $plan")
  }

  test("banded self-joins evaluate each hash kernel once (checkpoint, not recompute)") {
    import spark.implicits._
    val d = (0 until 20).map(i => (i.toLong, s"some document text number $i with words"))
      .toDF("doc_id", "text")
    // the candidate/pair plans must contain ZERO kernel invocations:
    // the compact projection is materialized before banding, so the
    // B-band × 2-side self-join scans the checkpoint instead of
    // re-evaluating the signature kernel up to 2B× per doc
    val mh = graft.ops.Dedup.minHashCandidates(graft.ops.Dedup.minHashSignatures(d))
    assert(!planString(mh).contains("graft_minhash_sig"),
      "minhash kernel re-evaluated inside the banded join")
    assert(planString(mh).contains("ExistingRDD"), "banding does not scan the checkpoint")
    val sh = graft.ops.Dedup.simHashPairs(graft.ops.Dedup.simHash(d))
    assert(!planString(sh).contains("graft_simhash"),
      "simhash kernel re-evaluated inside the chunk join")
    val e = (0 until 16).map(i => (i.toLong, Seq.tabulate(8)(j => (i + j) / 16.0f)))
      .toDF("vec_id", "embedding")
    val cp = graft.ops.Similarity.cosinePairs(e, threshold = 0.5)
    assert(!planString(cp).contains("graft_lsh_bucket"),
      "lsh bucket kernel re-evaluated inside the bucket self-join")
  }

  test("relation-cluster member counts are two-phase aggregation, not a hot-key window") {
    import spark.implicits._
    val ms = Seq(graft.schema.Membership("c1", "m1", 1.0),
      graft.schema.Membership("c2", "m2", 1.0)).toDS()
    val st = Seq(graft.schema.Statement("s1", "m1", "P", "m2", 0.9, "d", 0, 0, 1)).toDS()
    val rc = graft.canon.RelationClusters.cluster(st, ms)
    val plan = rc.queryExecution.executedPlan.toString
    // a window partitioned on rel_key would funnel every member row of a
    // hot relation cluster into ONE task; the two-phase groupBy+join
    // shape absorbs the hot key in map-side partial aggregation and
    // leaves the join AQE-skew-splittable
    assert(!plan.contains("Window"), s"window on skewable rel_key: $plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"n_members not a partial+final aggregate: $plan")
  }

  test("superedge aggregation uses partial aggregation (map-side combine)") {
    import spark.implicits._
    val ms = Seq(graft.schema.Membership("c1", "m1", 1.0)).toDS()
    val st = Seq(graft.schema.Statement("s1", "m1", "P", "m1", 0.9, "d", 0, 0, 1)).toDS()
    val se = graft.superedge.SuperEdges.superEdges(st, ms)
    val plan = se.queryExecution.executedPlan.toString
    // two HashAggregates around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("corpus-scale joins never broadcast (checkpoint stats undercount)") {
    import spark.implicits._
    // checkpointed inputs inherit their PRE-checkpoint size estimate —
    // for a synth range plan that's a few MB regardless of true row
    // count, and Catalyst once compile-time-broadcast the 10^6-row
    // statements side of the superedge join (profiled at 820
    // executor-s; an OOM at contract scale). The merge hints must hold
    // even when the sides look tiny to the optimizer.
    val ms = Seq(graft.schema.Membership("c1", "m1", 1.0),
      graft.schema.Membership("c2", "m2", 1.0)).toDS()
    val st = Seq(graft.schema.Statement("s1", "m1", "P", "m2", 0.9, "d", 0, 0, 1)).toDS()
    val mentions = Seq(graft.schema.Mention(
      "m1", "d", 0, "entity", "Person", "X", "x", 0, 1, 0.9, null)).toDS()
    for ((name, df) <- Seq(
        "superEdges" -> graft.superedge.SuperEdges.superEdges(st, ms).toDF(),
        "relationClusters" -> graft.canon.RelationClusters.cluster(st, ms),
        // the pipeline form is fully LAZY (statements⋈memberships² +
        // the superedge-count join-back all live in ONE plan) — the
        // no-broadcast doctrine must hold across all of them
        "relationClustersViaSuperedges" -> graft.canon.RelationClusters.cluster(
          st, ms, graft.superedge.SuperEdges.superEdges(st, ms)),
        "superEdgeJustifications" ->
          graft.canon.Justifications.superEdgeJustifications(st, ms),
        "annotatedMembers" ->
          graft.canon.Justifications.annotatedMembers(ms, mentions))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"$name broadcasts a corpus-scale side:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"$name lost its merge join:\n$plan")
    }
  }

  test("cleaning ops: per-row passes plan no shuffle; strip has no window") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "c\nd")).toDF("doc_id", "text")
    // repetition stats and PII redaction are pure projections — any
    // Exchange here would turn a cheap corpus scan into a shuffle of
    // the full text volume at 100 TB
    for (df <- Seq(graft.ops.Clean.repetitionStats(docs),
                   graft.ops.Clean.redactPii(docs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"per-row cleaning op shuffles:\n$plan")
    }
    // stripBoilerplate: ordered rebuild must be aggregate-shaped
    // (map-side partial agg absorbs long docs), never a Window over
    // doc_id, and the boilerplate filter must be an anti join
    val strip = graft.ops.Clean.stripBoilerplate(docs, 2L)
    val plan = strip.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in strip rebuild:\n$plan")
    assert(plan.contains("LeftAnti"), s"boilerplate filter not an anti join:\n$plan")
  }
}
