package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.synth.TranscriptSynth

/**
 * Round-6 optimization profiler (guide §1.4 noop-sink isolation).
 * NOT part of the driver contract — the frozen [[Bench]] stays the
 * measured artifact; this main exists so each pipeline output and
 * stage can be timed in isolation, with job descriptions for
 * event-log attribution. Prints one JSON line per timing.
 */
object BenchExtra {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pipeTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "2000000").toLong
    val spark = Sessions.local(cpus, "graft-bench-extra")
    val sc = spark.sparkContext

    def timed(name: String)(f: => Unit): Unit = {
      sc.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      sc.setJobDescription(null)
    }

    val cfg = TranscriptSynth.Config(
      nConvs = (pipeTurns / 10).toInt, turnsPerConv = 10)

    // warm-up JIT with a small pipeline
    val warm = Pipeline.run(TranscriptSynth.turnsDs(spark,
      TranscriptSynth.Config(nConvs = 2000, turnsPerConv = 10), partitions = cpus))
    warm.triples.count()
    warm.unpersist()

    var r: Pipeline.Result = null
    timed("pipeline_run_and_triples") {
      r = Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = cpus * 2))
      r.triples.count()
    }
    // stage cardinalities (cheap checkpoint scans) for scale reasoning
    for ((n, df) <- Seq("mentions" -> r.mentions.toDF(),
        "statements" -> r.statements.toDF(), "events" -> r.events.toDF(),
        "eventArgs" -> r.eventArgs, "memberships" -> r.memberships.toDF(),
        "surfaces" -> r.surfaces, "superEdges" -> r.superEdges.toDF()))
      println(s"""{"count":"$n","n":${df.count()}}""")
    // the six kg_full_outputs members, SEQUENTIALLY so each is attributable
    timed("out_eventClusters_keyedEvents") { force(r.eventClusters) }
    timed("out_eventPrototypes") { force(r.eventPrototypes.toDF()) }
    timed("out_relationClusters") { force(r.relationClusters) }
    timed("out_informativeJustifications") { force(r.informativeJustifications) }
    timed("out_clusterLinks") { force(r.clusterLinks) }
    timed("out_protoJustifications") { force(r.protoJustifications) }
    timed("out_superEdgeJustifications") { force(r.superEdgeJustifications) }
    r.unpersist()

    // second pipeline run: the CONCURRENT kg_full_outputs shape, for
    // comparability with the frozen bench entry
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    timed("pipeline_run_and_triples_2") {
      r = Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = cpus * 2))
      r.triples.count()
    }
    timed("kg_full_outputs_concurrent") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val outs = Seq(r.eventPrototypes.toDF(), r.relationClusters,
        r.informativeJustifications, r.clusterLinks,
        r.protoJustifications, r.superEdgeJustifications)
      Await.result(Future.sequence(outs.map(df => Future(force(df)))), Duration.Inf)
      r.unpersist()
    }
    spark.stop()
  }
}
