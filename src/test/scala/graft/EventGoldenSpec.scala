package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.canon.EventCoref
import graft.synth.TranscriptSynth

/** Golden-fixture event-coreference parity: planted facts with
  * identical (type, subject, object, place) families must land in ONE
  * event cluster; distinct facts must not merge. Compared at
  * canonical-name granularity (ID-insensitive, same contract as the
  * triple golden — SURVEY.md §5.1), P/R ≥ 0.95. */
class EventGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("event cluster frames P/R >= 0.95 on golden corpus") {
    val cfg = TranscriptSynth.Config(nConvs = 300, turnsPerConv = 10)
    val r = Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = 8))
    val frames = EventCoref
      .namedFrames(r.eventClusters, r.eventArgs, r.memberships, r.prototypes)
      .collect()
      .map(x => (x.getString(1), x.getString(2), x.getString(3), x.getString(4),
        x.getString(5)) -> x.getLong(6))
      .toMap
    val golden = TranscriptSynth.goldenEventFrames(cfg)

    val tp = (frames.keySet intersect golden.keySet).size.toDouble
    val precision = tp / frames.size
    val recall = tp / golden.size
    info(f"emitted=${frames.size} golden=${golden.size} P=$precision%.4f R=$recall%.4f")
    assert(precision >= 0.95, f"event precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"event recall $recall%.4f < 0.95")

    // member counts agree on the matched frames (coreferent events
    // actually merged, not just frame keys coinciding)
    val matched = frames.keySet intersect golden.keySet
    val agree = matched.count(k => frames(k) == golden(k)).toDouble / matched.size
    assert(agree >= 0.95, f"member-count agreement $agree%.4f < 0.95")

    // every emitted event mention belongs to exactly one cluster
    assert(r.eventMemberships.count() == r.events.count())

    // list-valued Participant roles are golden-pinned, not just keyed:
    // the synth plants "with A and B" events, and their frames must
    // surface BOTH names (sorted, comma-joined) and match the golden
    val multi = golden.keySet.filter(k => k._5 != null && k._5.contains(", "))
    assert(multi.nonEmpty, "synth planted no two-participant events")
    val multiHit = multi.count(frames.contains).toDouble / multi.size
    assert(multiHit >= 0.95,
      f"two-participant frames recovered at $multiHit%.4f < 0.95")
  }

  test("event prototypes carry kind=event, the event type, and mode trigger name") {
    val cfg = TranscriptSynth.Config(nConvs = 40, turnsPerConv = 8)
    val r = Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = 4))
    val protos = r.eventPrototypes.collect()
    assert(protos.nonEmpty)
    assert(protos.forall(_.kind == "event"))
    val types = protos.map(_.etype).toSet
    assert(types.subsetOf(graft.extract.Lexicon.triggers.values.map(_._1).toSet))
    // n_members totals match the event mention count
    assert(protos.map(_.n_members).sum == r.events.count())
  }

  test("participant lists dedup names: two arg clusters with one prototype name") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // two DISTINCT Participant arg clusters (cX, cY) whose prototypes
    // carry the SAME canonical name — the frame must read "Alex", not
    // "Alex, Alex" (the reference's per-type entity lists are
    // name-level)
    val keyed = Seq(("e1", "Meet", "ev1")).toDF("event_id", "etype", "cluster_id")
    val args = Seq(
      graft.schema.EventArg("e1", "Participant", "a1", "Person", "alex", null),
      graft.schema.EventArg("e1", "Participant", "a2", "Person", "aelx", null),
      graft.schema.EventArg("e1", "Subject", "a3", "Person", "sam", null)).toDS().toDF()
    val ms = Seq(
      graft.schema.Membership("cX", "a1", 1.0),
      graft.schema.Membership("cY", "a2", 1.0),
      graft.schema.Membership("cS", "a3", 1.0)).toDS()
    val protos = Seq(
      graft.schema.Prototype("pX", "cX", "entity", "Alex", "Person", null, 1L),
      graft.schema.Prototype("pY", "cY", "entity", "Alex", "Person", null, 1L),
      graft.schema.Prototype("pS", "cS", "entity", "Sam", "Person", null, 1L)).toDS()
    val rows = EventCoref.namedFrames(keyed, args, ms, protos).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("participants") == "Alex")
    assert(rows.head.getAs[String]("subj") == "Sam")
  }

  test("keyedEventsViaDict matches the membership-join path bit-for-bit") {
    // the round-6 dict-resolution path must produce the identical
    // keyed-event table (same ekey/cluster per event) as the generic
    // memberships sort-merge — compared as full row sets on a corpus
    // with events, places, participants, aliases and typos
    val cfg = TranscriptSynth.Config(nConvs = 120, turnsPerConv = 10)
    val r = Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = 8))
    val viaMs = EventCoref.keyedEvents(r.events, r.eventArgs, r.memberships)
      .collect().map(_.toString).sorted
    val viaDict = EventCoref
      .keyedEventsViaDict(r.events, r.eventArgs, r.surfaceClusters)
      .collect().map(_.toString).sorted
    assert(viaMs.sameElements(viaDict))
    r.unpersist()
  }
}
