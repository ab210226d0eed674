package graft

import org.apache.spark.sql.functions._

/** Dev probe: KE density of the synthetic corpus at a given turn count
  * — how many mentions / statements / event mentions / event args the
  * extractor emits. Used to normalize cross-round pipeline throughput
  * when the synth corpus itself changes density (turns/sec is only
  * comparable at equal KEs/turn). */
object KeCount {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "2000000").toLong
    val spark = Sessions.local(cpus, "ke-count")
    val cfg = synth.TranscriptSynth.Config(
      nConvs = (nTurns / 10).toInt, turnsPerConv = 10)
    val ex = _root_.graft.extract.MentionExtractor
      .extract(synth.TranscriptSynth.turnsDs(spark, cfg, partitions = cpus * 2))
    val r = ex.select(
      sum(size(col("mentions"))).as("mentions"),
      sum(size(col("statements"))).as("statements"),
      sum(size(col("events"))).as("events"),
      sum(size(col("eventArgs"))).as("event_args")).head()
    println(s"""{"turns":$nTurns,"mentions":${r.getLong(0)},""" +
      s""""statements":${r.getLong(1)},"events":${r.getLong(2)},""" +
      s""""event_args":${r.getLong(3)}}""")
    spark.stop()
  }
}
