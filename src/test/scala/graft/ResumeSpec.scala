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

  test("--dedup adds a resume-safe dedup_canon stage; duplicates don't change the KG") {
    import spark.implicits._
    val cfg = TranscriptSynth.Config(nConvs = 60, turnsPerConv = 6)
    val base = TranscriptSynth.turnsDs(spark, cfg, partitions = 4)
    // plant exact duplicate conversations under fresh ids — the
    // re-ingestion scenario the dedup stage exists for
    val dups = base.filter(t => t.conv_id.drop(4).toLong % 3 == 0)
      .map(t => t.copy(conv_id = t.conv_id + "-reingest"))
    val withDups = base.unionByName(dups)

    val cleanRoot = Files.createTempDirectory("kgclean").toString
    val cleanStore = new SnapshotStore(cleanRoot)
    val nClean = Main.runResumable(spark, base, cleanStore)

    val dedupRoot = Files.createTempDirectory("kgdedup").toString
    val store = new SnapshotStore(dedupRoot)
    val n1 = Main.runResumable(spark, withDups, store, dedupJaccard = Some(0.9))
    assert(store.manifestEntries().size == 20) // 19 + dedup_canon
    val verdicts = store.read(spark, "dedup_canon").get
    // every planted duplicate family collapsed to ONE canonical conv
    assert(verdicts.filter("is_dup").count() == dups.map(_.conv_id).distinct().count())
    // the KG over the dedup'd corpus ≡ the KG over the clean corpus:
    // triples are conversation-id-free, and each planted family's
    // canonical member carries identical text
    val tClean = cleanStore.read(spark, "triples").get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val tDedup = store.read(spark, "triples").get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(nClean > 0 && tDedup == tClean)

    // resume: stage count stable, verdicts not recomputed, same triples
    val n2 = Main.runResumable(spark, withDups, store, dedupJaccard = Some(0.9))
    assert(n2 == n1 && store.manifestEntries().size == 20)
  }

  test("--strip-boilerplate adds a resume-safe inventory stage; boilerplate turns don't change the KG") {
    import spark.implicits._
    val cfg = TranscriptSynth.Config(nConvs = 60, turnsPerConv = 6)
    val base = TranscriptSynth.turnsDs(spark, cfg, partitions = 4)
    // plant the serving-stack scenario: an identical system-prompt
    // turn (entity-bearing, so it WOULD mint mentions) in every
    // conversation, appended as a fresh turn_idx
    val banner = base.groupByKey(_.conv_id).mapGroups { (conv, ts) =>
      val maxIdx = ts.map(_.turn_idx).max
      graft.schema.Turn(conv, maxIdx + 1, "system",
        "Zorblatt Industries founded Quuxware Labs.", // trigger-bearing:
        null, new java.sql.Timestamp(0L))             // mints a statement
    }
    val withBanner = base.unionByName(banner)

    val cleanRoot = Files.createTempDirectory("kgclean2").toString
    val cleanStore = new SnapshotStore(cleanRoot)
    val nClean = Main.runResumable(spark, base, cleanStore)

    // without strip, the planted banner changes the KG (the hazard)
    val dirtyStore = new SnapshotStore(Files.createTempDirectory("kgdirty").toString)
    Main.runResumable(spark, withBanner, dirtyStore)
    val tDirty = dirtyStore.read(spark, "triples").get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    val stripRoot = Files.createTempDirectory("kgstrip").toString
    val store = new SnapshotStore(stripRoot)
    val n1 = Main.runResumable(spark, withBanner, store,
      stripBoilerplateMinConvs = Some(30L))
    assert(store.manifestEntries().size == 20) // 19 + boilerplate_norms
    // the inventory holds exactly the planted banner (60 convs ≥ 30)
    val norms = store.read(spark, "boilerplate_norms").get.collect()
    assert(norms.length == 1 && norms.head.getLong(1) == 60L)

    val tClean = cleanStore.read(spark, "triples").get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val tStrip = store.read(spark, "triples").get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(nClean > 0 && tStrip == tClean)
    assert(tDirty != tClean) // the filter removed a REAL difference

    // resume: inventory not recomputed, stage count stable
    val n2 = Main.runResumable(spark, withBanner, store,
      stripBoilerplateMinConvs = Some(30L))
    assert(n2 == n1 && store.manifestEntries().size == 20)
  }
}
