package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.synth.TranscriptSynth

/**
 * Benchmark main. Headline metric: end-to-end KG-pipeline throughput
 * in turns/sec on the deterministic synthetic transcript corpus
 * (BASELINE.md protocol), plus per-query timings of representative
 * operators over the sf-dir parquet tables.
 *
 * Scaling protocol: run with SPARK_GRAFT_CPUS=8 then =32 on the same
 * input; efficiency = tput(32) / (4 × tput(8)). See BASELINE.md.
 */
object Bench {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pipeTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "400000").toLong
    val spark = Sessions.local(cpus, "graft-bench")

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      timings(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // 1. headline: full KG pipeline over synthetic transcripts.
    // min of 2 runs: the sandbox VM shows heavy hypervisor steal time
    // (cumulative steal ≈ user in /proc/stat), so single-run wall
    // clock is unreliable; min is the cleanest estimator under
    // one-sided noise (also absorbs first-run JIT).
    var nTriples = 0L
    val cfg = TranscriptSynth.Config(
      nConvs = (pipeTurns / 10).toInt, turnsPerConv = 10)
    def onePipeline(): Double = {
      val t0 = System.nanoTime()
      val r = Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = cpus * 2))
      nTriples = r.triples.count()
      (System.nanoTime() - t0) / 1e9
    }
    timings("kg_pipeline") = math.min(onePipeline(), onePipeline())
    val turnsPerSec = cfg.nTurns / timings("kg_pipeline")

    // 2. extraction-only throughput (mention detection stage)
    timed("extract_only") {
      MentionExtractor_forceCount(spark, cfg)
    }

    // 3. representative table operators at the bench scale factor
    val q = SparkEntry.queries
    Seq("q_join_chain", "q_mode_tiebreak", "q_group_concat",
      "q_stable_turn_order", "q_dedup_exact", "q_minhash_sigs",
      "q_simhash", "q_token_count", "q_langid", "q_ann_topk",
      "q_cosine_pairs").foreach { name =>
      timed(name) {
        try force(q(name)(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      }
    }

    val total = timings.values.sum
    val qs = timings.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""sf":"$sfDir","bench_turns":${cfg.nTurns},"kg_triples":$nTriples,""" +
        f""""turns_per_sec":$turnsPerSec%.1f,"cores":$cpus}""")
    spark.stop()
  }

  private def MentionExtractor_forceCount(spark: SparkSession, cfg: TranscriptSynth.Config): Long = {
    import spark.implicits._
    graft.extract.MentionExtractor
      .extract(TranscriptSynth.turnsDs(spark, cfg,
        partitions = spark.sparkContext.defaultParallelism * 2))
      .flatMap(_.mentions).count()
  }
}
