package graft.snapshot

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-semantics snapshot layer: immutable partitioned-parquet
 * snapshot directories + an atomically-swapped JSON manifest carrying
 * snapshot lineage (id, parent, stage, per-partition row counts).
 *
 * Realizes the north-rule "resumable from Iceberg-snapshot
 * checkpoints with per-partition lineage and counter metrics" without
 * an Iceberg runtime jar on the offline classpath (SURVEY.md §4.3.5):
 * the semantics (immutable snapshots, atomic manifest swap,
 * time-travel by snapshot id) match, so a real Iceberg catalog is a
 * config swap. This is also the Spark-native analog of the
 * reference's step-resumable pipeline — the user-selected inclusive
 * step range with idempotent delete-then-insert
 * (/root/reference/update_kg/update_kg.py:17-35,
 * update_kg/Updater.py:110-117): a stage re-run overwrites its own
 * snapshot dir and re-points the manifest, never mutating inputs.
 *
 * Layout: <root>/<stage>/snap-<id>/  (parquet)
 *         <root>/manifest.json       (atomic swap via tmp + move)
 */
class SnapshotStore(val root: String) {

  private def manifestPath = Paths.get(root, "manifest.json")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  /** Write `df` as the next snapshot of `stage`; returns snapshot id.
    * SINGLE-PASS: the stage computes exactly once — the write carries
    * a `_pid` (spark_partition_id) lineage column into the parquet,
    * and the per-partition row counters (the reference's
    * progress-counter analog, update_kg/Updater.py:152) are then
    * aggregated from the WRITTEN files, a column-pruned scan of one
    * RLE int column, never a second computation of the stage.
    * `fingerprint` records the config/input identity the snapshot was
    * built under; [[getOrCreate]] refuses to resume across a
    * fingerprint change. */
  def write(stage: String, df: DataFrame, fingerprint: String = "",
      builderWallMs: Long = 0L): Long = {
    // monotonic per stage: two writes within one millisecond (e.g. a
    // fingerprint-invalidated recompute of a tiny stage) must not
    // collide on directory + manifest key
    val snapId = math.max(current(stage).map(_ + 1L).getOrElse(0L),
      System.currentTimeMillis())
    val dir = s"$root/$stage/snap-$snapId"
    // wall_ms covers forcing the stage's computation: the parquet write
    // (the action that executes the returned plan) PLUS the builder's
    // own wall (`builderWallMs`, timed by getOrCreate) — builders that
    // run eager actions (localCheckpoints, guard counts: the dedup
    // stage does most of its work there) would otherwise be invisible
    // and the manifest's per-stage profile would under-credit them
    // (observed: a 20M-turn dedup_canon stage credited 10.7 s of a
    // ~22 min builder). The manifest is thereby a per-stage wall/row
    // profile of the run.
    val t0 = System.nanoTime()
    df.withColumn("_pid", spark_partition_id())
      .write.mode("overwrite").parquet(dir)
    val wallMs = builderWallMs + (System.nanoTime() - t0) / 1000000L
    val counts = df.sparkSession.read.parquet(dir)
      .groupBy(col("_pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val parent = current(stage).map(_.toString).getOrElse("null")
    val entry =
      s"""{"stage":"${esc(stage)}","snapshot":$snapId,"parent":$parent,""" +
        s""""fp":"${esc(fingerprint)}","wall_ms":$wallMs,""" +
        s""""rows":${counts.map(_._2).sum},"partitions":[""" +
        counts.map { case (p, c) => s"""{"pid":$p,"rows":$c}""" }.mkString(",") + "]}"
    val existing = readManifest().filterNot(_.contains(s""""stage":"${esc(stage)}","snapshot":$snapId"""))
    val json = "[" + (existing :+ entry).mkString(",") + "]"
    val tmp = Paths.get(root, s".manifest.tmp.$snapId")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snapId
  }

  private def readManifest(): Vector[String] = {
    if (!Files.exists(manifestPath)) Vector.empty
    else {
      val s = new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8).trim
        .stripPrefix("[").stripSuffix("]")
      // entries are flat objects with a nested array — split on "},{" at depth 1
      if (s.isEmpty) Vector.empty
      else {
        val out = Vector.newBuilder[String]
        var depth = 0; var start = 0
        for (i <- s.indices) s.charAt(i) match {
          case '{' | '[' => depth += 1
          case '}' | ']' =>
            depth -= 1
            if (depth == 0) { out += s.substring(start, i + 1); start = i + 1 }
          case ',' if depth == 0 => start = i + 1
          case _ =>
        }
        out.result().map(_.trim).filter(_.nonEmpty)
      }
    }
  }

  /** Latest snapshot id of a stage, if any. */
  def current(stage: String): Option[Long] = {
    val pat = s""""stage":"${esc(stage)}","snapshot":""".r
    readManifest()
      .filter(_.contains(s""""stage":"${esc(stage)}""""))
      .flatMap { e =>
        val k = e.indexOf("\"snapshot\":")
        if (k < 0) None
        else Some(e.substring(k + 11).takeWhile(_.isDigit).toLong)
      }
      .sorted.lastOption
  }

  /** Fingerprint the latest snapshot of a stage was written under
    * (pre-fingerprint manifests report ""). */
  def currentFingerprint(stage: String): Option[String] =
    current(stage).flatMap { id =>
      readManifest()
        .find(e => e.contains(s""""stage":"${esc(stage)}","snapshot":$id"""))
        .map { e =>
          val k = e.indexOf("\"fp\":\"")
          if (k < 0) ""
          else {
            val start = k + 6
            val sb = new StringBuilder
            var i = start
            while (i < e.length && e.charAt(i) != '"') {
              if (e.charAt(i) == '\\' && i + 1 < e.length) { sb += e.charAt(i + 1); i += 2 }
              else { sb += e.charAt(i); i += 1 }
            }
            sb.toString
          }
        }
    }

  /** Read a stage's snapshot (latest by default; pass an id for
    * time-travel). Returns None if the stage was never materialized —
    * the resume decision point. The `_pid` lineage column is internal
    * and dropped. */
  def read(spark: SparkSession, stage: String, snapshot: Option[Long] = None): Option[DataFrame] =
    snapshot.orElse(current(stage)).flatMap { id =>
      val dir = s"$root/$stage/snap-$id"
      if (Files.exists(Paths.get(dir))) Some(spark.read.parquet(dir).drop("_pid"))
      else None
    }

  /** Resume-or-compute: read the latest snapshot if it exists AND was
    * written under the same `fingerprint` (config/input identity);
    * else compute, snapshot, and re-read (so downstream plans scan
    * parquet with pushdown instead of recomputing lineage). A changed
    * fingerprint therefore re-keys the stage and, transitively, every
    * downstream stage whose fingerprint embeds the same config — a
    * rerun with a different --threshold or --input can never silently
    * reuse stale snapshots. */
  def getOrCreate(spark: SparkSession, stage: String, fingerprint: String = "")
      (compute: => DataFrame): DataFrame =
    read(spark, stage)
      .filter(_ => currentFingerprint(stage).contains(fingerprint))
      .getOrElse {
        val t0 = System.nanoTime()
        val df = compute
        write(stage, df, fingerprint,
          builderWallMs = (System.nanoTime() - t0) / 1000000L)
        // the builder frame is DEAD after the write (all consumers read
        // the parquet snapshot back) — release any localCheckpoint
        // blocks its plan pinned, or a long session running many stages
        // accumulates them (Dataset GC alone never frees them; see
        // graft.util.Blocks). Builders must not return frames sharing
        // checkpoints with still-live external frames — stage inputs
        // here are snapshot re-reads, so none do.
        graft.util.Blocks.release(df)
        read(spark, stage).get
      }

  /** Every snapshot id of a stage, ascending (manifest lineage). */
  def snapshots(stage: String): Seq[Long] =
    readManifest()
      .filter(_.contains(s""""stage":"${esc(stage)}""""))
      .flatMap { e =>
        val k = e.indexOf("\"snapshot\":")
        if (k < 0) None
        else Some(e.substring(k + 11).takeWhile(_.isDigit).toLong)
      }
      .sorted

  /** Iceberg-APPEND semantics: the new snapshot dir holds ONLY `df`
    * (the delta), the manifest entry chains to the parent as usual,
    * and [[readAll]] unions the chain — so appending a micro-batch
    * costs O(delta), never O(accumulated). A stage is either
    * append-mode (read with [[readAll]]) or replace-mode (read with
    * [[read]]); mixing the two on one stage name is a caller bug
    * (readAll would union superseded full snapshots). */
  def append(stage: String, df: DataFrame, fingerprint: String = ""): Long =
    write(stage, df, fingerprint)

  /** Union of EVERY snapshot of an append-mode stage, oldest first.
    * None if the stage was never appended to. */
  def readAll(spark: SparkSession, stage: String): Option[DataFrame] = {
    val dirs = snapshots(stage)
      .map(id => s"$root/$stage/snap-$id")
      .filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).drop("_pid"))
  }

  /** All manifest entries (raw JSON) — metrics/lineage introspection. */
  def manifestEntries(): Seq[String] = readManifest()

  /** Distinct stage names present in the manifest. */
  def stages(): Seq[String] =
    readManifest().flatMap { e =>
      val k = e.indexOf("\"stage\":\"")
      if (k < 0) None
      else Some(e.substring(k + 9).takeWhile(_ != '"'))
    }.distinct

  /** Iceberg `expire_snapshots` semantics for a REPLACE-mode stage:
    * delete every snapshot dir except the current one and drop the
    * expired entries from the manifest. Time-travel to expired ids is
    * gone; the current snapshot, its fingerprint, and therefore all
    * resume behavior are untouched. Continuous maintainers
    * ([[graft.streaming.IncrementalKg]]) call this once per
    * micro-batch — without it a long-lived stream retains one full KG
    * copy (~20 stages) per batch, O(batches × KG) storage on a stable
    * corpus. APPEND-mode stages (ke_log) must never be expired: their
    * old snapshots ARE the data, not superseded versions. Returns the
    * number of snapshots expired. */
  def expire(stage: String): Int = {
    val cur = current(stage)
    val stale = snapshots(stage).filterNot(cur.contains)
    stale.foreach { id =>
      val dir = Paths.get(s"$root/$stage/snap-$id")
      if (Files.exists(dir)) {
        val walk = Files.walk(dir) // close: called per batch × stage
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => Files.delete(p))
        finally walk.close()
      }
    }
    if (stale.nonEmpty) {
      val keys = stale.map(id => s""""stage":"${esc(stage)}","snapshot":$id""").toSet
      val keep = readManifest().filterNot(e => keys.exists(e.contains))
      val json = "[" + keep.mkString(",") + "]"
      val tmp = Paths.get(root, s".manifest.tmp.expire.${System.nanoTime()}")
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    stale.size
  }
}
