package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.snapshot.SnapshotStore
import graft.synth.TranscriptSynth

/** Checkpoint/resume contract (north rule; SURVEY §5.4): a resumed
  * run reads snapshots instead of recomputing and emits the identical
  * triple set. */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("resume-from-snapshot ≡ clean run, and is read-only") {
    val cfg = TranscriptSynth.Config(nConvs = 80, turnsPerConv = 8)
    val turns = TranscriptSynth.turnsDs(spark, cfg, partitions = 4)
    val root = Files.createTempDirectory("kgrun").toString
    val store = new SnapshotStore(root)

    val n1 = Main.runResumable(spark, turns, store)
    assert(n1 > 0)
    val stages = store.manifestEntries().size
    assert(stages == 19) // ke..triples + events/relations/justifications + proto copy-backs
    // the event/relation/justification stages are genuinely populated
    assert(store.read(spark, "event_clusters").get.count() > 0)
    assert(store.read(spark, "event_prototypes").get.count() > 0)
    assert(store.read(spark, "relation_clusters").get.count() > 0)
    assert(store.read(spark, "cluster_justifications").get.count() > 0)
    assert(store.read(spark, "proto_justifications").get.count() > 0)
    assert(store.read(spark, "superedge_justifications").get.count() > 0)

    val t1 = store.read(spark, "triples").get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    // resumed run: no new snapshots, same triples
    val n2 = Main.runResumable(spark, turns, store)
    assert(n2 == n1)
    assert(store.manifestEntries().size == stages)
    val t2 = store.read(spark, "triples").get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(t2 == t1)

    // manifests carry per-partition lineage counters
    assert(store.manifestEntries().forall(_.contains("\"pid\":")))
  }
}
