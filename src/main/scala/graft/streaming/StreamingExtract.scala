package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.extract.MentionExtractor
import graft.schema.{Mention, Turn}

/**
 * Structured-Streaming face of the extraction stage — the reference
 * pipeline is batch (its "streaming" is a cron re-run of the step
 * range, update_kg/update_kg.py:17-35), but the extraction kernel is
 * stateless per-turn, so the SAME flatMap runs unchanged under
 * `readStream`: transcripts land incrementally (Kafka / file source /
 * Delta-style appends at contract scale) and mentions append to the
 * KE sink continuously instead of re-running stage 1 over the corpus.
 *
 * Three shapes, smallest useful surface of the streaming API:
 *  - [[mentions]]: stateless append — embarrassingly parallel,
 *    no shuffle, no state store;
 *  - [[mentionCountsByWindow]]: event-time windowed aggregation with
 *    a watermark (late turns beyond the watermark are dropped, state
 *    is bounded — the A2 group-count analog over time);
 *  - [[conversationProgress]]: per-conversation running state via
 *    mapGroupsWithState (count + max turn_idx — the stable-turn-order
 *    bookkeeping a streaming KG builder needs before sessionizing).
 */
object StreamingExtract {

  /** Stateless streaming extraction: one mention row per detected
    * span, append mode. Works identically on batch Datasets. */
  def mentions(turns: Dataset[Turn]): Dataset[Mention] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.flatMap(t => MentionExtractor.extractTurn(t).mentions)
  }

  /** Windowed mention counts per entity type with a watermark:
    * bounded state, late data beyond `watermark` dropped. */
  def mentionCountsByWindow(turns: Dataset[Turn],
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .withWatermark("ts", watermark)
      .flatMap(t => MentionExtractor.extractTurn(t).mentions
        .map(m => (m.etype, t.ts)))
      .toDF("etype", "ts")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("etype"))
      .agg(count(lit(1)).as("n_mentions"))
  }

  /** Per-conversation running progress (turn count, max turn_idx) via
    * mapGroupsWithState — update-mode output, one row per conv per
    * micro-batch it appears in. */
  def conversationProgress(turns: Dataset[Turn]): Dataset[(String, Long, Int)] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .groupByKey(_.conv_id)
      .mapGroupsWithState[(Long, Int), (String, Long, Int)](
        GroupStateTimeout.NoTimeout) {
        (conv: String, it: Iterator[Turn], state: GroupState[(Long, Int)]) =>
          val (c0, m0) = state.getOption.getOrElse((0L, -1))
          var c = c0
          var m = m0
          it.foreach { t =>
            c += 1
            if (t.turn_idx > m) m = t.turn_idx
          }
          state.update((c, m))
          (conv, c, m)
      }
  }

  /** Streaming EXACT dedup over incoming conversation turns, the
    * ingest-time face of [[graft.ops.Dedup.exact]]: only the FIRST
    * turn per normalized-text fingerprint survives (Structured
    * Streaming's built-in within-watermark dedup — keyed state in the
    * state store, no custom state code). The watermark ACTUALLY bounds
    * the store here: `dropDuplicatesWithinWatermark` evicts fingerprint
    * state once the watermark passes it (plain `dropDuplicates("fp")`
    * would ignore the watermark for eviction because the event-time
    * column is not part of the dedup key, and the store would grow
    * without bound — the 10^12-turn hazard). The trade is explicit:
    * a re-ingest arriving later than `watermark` of event time
    * re-emits — the standard bounded-state contract (same as windowed
    * aggs). Append mode. Batch frames take the plain global
    * `dropDuplicates` branch (exact, no state store — Spark rejects
    * the within-watermark form outside streaming). */
  def dedupTurns(turns: Dataset[Turn], watermark: String = "24 hours"): Dataset[Turn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val fp = turns.toDF()
      .withColumn("fp", xxhash64(regexp_replace(lower(col("text")), "\\s+", " ")))
    val deduped =
      if (turns.isStreaming)
        fp.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("fp")
      else fp.dropDuplicates("fp")
    deduped.drop("fp").as[Turn]
  }

  /** The OutputMode each shape needs — kept next to the operators so
    * callers don't guess. */
  val mentionsMode: OutputMode = OutputMode.Append()
  val windowMode: OutputMode = OutputMode.Update()
  val progressMode: OutputMode = OutputMode.Update()
  val dedupMode: OutputMode = OutputMode.Append()
}
