package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Triple
import graft.synth.TranscriptSynth

/** Golden-fixture end-to-end parity: run the full pipeline on the
  * deterministic synthetic corpus and compare the emitted corpus-level
  * (subj, pred, obj) set against the planted ground truth at
  * P/R ≥ 0.95 (BASELINE.json metric; SURVEY.md §5.1). */
class PipelineGoldenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("end-to-end triple P/R >= 0.95 on golden corpus") {
    val cfg = TranscriptSynth.Config(nConvs = 400, turnsPerConv = 10)
    val turns = TranscriptSynth.turnsDs(spark, cfg, partitions = 8)
    val result = Pipeline.run(turns)

    val emitted: Set[Triple] = result.triples.collect().toSet
    val golden: Set[Triple] = TranscriptSynth.goldenTriples(cfg)

    val tp = (emitted intersect golden).size.toDouble
    val precision = tp / emitted.size
    val recall = tp / golden.size
    info(f"emitted=${emitted.size} golden=${golden.size} P=$precision%.4f R=$recall%.4f")
    assert(precision >= 0.95, f"precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
  }

  test("no extraction errors on synthetic corpus") {
    val cfg = TranscriptSynth.Config(nConvs = 50, turnsPerConv = 10)
    val result = Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = 4))
    assert(result.errors.count() == 0)
  }

  test("distributed and local synthesis agree") {
    val cfg = TranscriptSynth.Config(nConvs = 20, turnsPerConv = 5)
    val ds = TranscriptSynth.turnsDs(spark, cfg, partitions = 7).collect()
      .sortBy(t => (t.conv_id, t.turn_idx))
    val local = TranscriptSynth.turnsLocal(cfg)
      .sortBy(t => (t.conv_id, t.turn_idx))
    assert(ds.toSeq == local)
  }
}
