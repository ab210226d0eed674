package graft

import graft.synth.TranscriptSynth
import graft.extract.MentionExtractor
import graft.link.Linker
import graft.cc.ConnectedComponents
import graft.canon.Canonicalizer
import graft.superedge.SuperEdges

/** Dev-only stage timing harness (not part of the library surface). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val nTurns = sys.env.getOrElse("SCRATCH_TURNS", "4000").toLong
    val spark = Sessions.local(cores, "scratch")
    import spark.implicits._
    val cfg = TranscriptSynth.Config(nConvs = (nTurns / 10).toInt, turnsPerConv = 10)
    val turns = TranscriptSynth.turnsDs(spark, cfg, partitions = cores * 2)
    if (sys.env.get("SCRATCH_MODE").contains("bench")) {
      val n = time("pipeline_end_to_end") {
        Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = cores * 2))
          .triples.count()
      }
      println(s"[scratch] triples=$n")
      spark.stop()
      return
    }
    val kes = time("extract")(MentionExtractor.extract(turns).persist())
    val mentions = kes.flatMap(_.mentions).persist()
    println(s"[scratch] mentions=${time("mentions.count")(mentions.count())}")
    val statements = kes.flatMap(_.statements)
    val (surf0, edges) = Linker.matchEdges(mentions)
    val surf = surf0.persist()
    println(s"[scratch] surfaces=${time("surf.count")(surf.count())}")
    val edgesDf = edges.toDF().persist()
    println(s"[scratch] edges=${time("edges.count")(edgesDf.count())}")
    val comp = time("cc")(ConnectedComponents.run(edgesDf).persist())
    println(s"[scratch] comp=${comp.count()}, ncomp=${comp.select("component").distinct().count()}")
    val sc = time("surfClusters")(
      Canonicalizer.withKind(Canonicalizer.surfaceClusters(surf, comp)).persist())
    println(s"[scratch] surfClusters=${sc.count()}")
    val memberships = time("memberships")(Canonicalizer.memberships(mentions, sc).persist())
    println(s"[scratch] memberships=${memberships.count()}")
    val prototypes = time("prototypes")(Canonicalizer.prototypes(mentions, sc).persist())
    println(s"[scratch] prototypes=${prototypes.count()}")
    val se = time("superedges")(SuperEdges.superEdges(statements, memberships).persist())
    println(s"[scratch] superedges=${se.count()}")
    val triples = time("triples")(SuperEdges.namedTriples(se, prototypes))
    val emitted = triples.collect().toSet
    if (nTurns <= 20000) {
      val golden = TranscriptSynth.goldenTriples(cfg)
      val tp = (emitted intersect golden).size.toDouble
      println(f"[scratch] emitted=${emitted.size} golden=${golden.size} " +
        f"P=${tp / emitted.size}%.4f R=${tp / golden.size}%.4f")
      (emitted -- golden).take(10).foreach(t => println(s"[scratch] FP: $t"))
      (golden -- emitted).take(10).foreach(t => println(s"[scratch] FN: $t"))
    } else println(s"[scratch] emitted=${emitted.size}")
    spark.stop()
  }
}
