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
    if (sys.env.get("SCRATCH_MODE").contains("micro")) {
      val n = 200000
      time("synth_200k") { var i = 0L; while (i < n) { TranscriptSynth.turnAt(cfg, i); i += 1 } }
      val ts = (0L until n.toLong).map(TranscriptSynth.turnAt(cfg, _)).toArray
      time("extract_200k") { var i = 0; while (i < n) { MentionExtractor.extractTurn(ts(i)); i += 1 } }
      time("extract_200k_2") { var i = 0; while (i < n) { MentionExtractor.extractTurn(ts(i)); i += 1 } }
      spark.stop()
      return
    }
    if (sys.env.get("SCRATCH_MODE").contains("plan")) {
      val r = Pipeline.run(TranscriptSynth.turnsDs(spark,
        TranscriptSynth.Config(nConvs = 30, turnsPerConv = 8), partitions = 4))
      for ((nm, df) <- Seq("memberships" -> r.memberships.toDF(),
          "prototypes" -> r.prototypes.toDF(), "superEdges" -> r.superEdges.toDF(),
          "triples" -> r.triples.toDF())) {
        val p = df.queryExecution.executedPlan.toString
        println(s"[scratch] == $nm joins: " + "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
          .findAllIn(p).toList.groupBy(identity).map { case (k, v) => s"$k x${v.size}" }.mkString(", "))
      }
      spark.stop()
      return
    }
    if (sys.env.get("SCRATCH_MODE").contains("dedupdiag")) {
      // conversation-dedup cost diagnostic: band-bucket distribution and
      // candidate volume vs cap on the synthdup boilerplate corpus
      import org.apache.spark.sql.functions._
      val base = Main.loadTurns(spark, s"synthdup:$nTurns")
      val docs = time("conversationDocs") {
        graft.ops.ConversationDedup.conversationDocs(base).localCheckpoint(true) }
      println(s"[scratch] convs=${docs.count()}")
      val r = sys.env.getOrElse("SCRATCH_R", "2").toInt
      val sigs = graft.ops.Dedup.minHashSignatures(
        docs.select(col("doc_id"), col("text")))
      val bands = (0 until 16 / r).map { b =>
        sigs.select(col("doc_id"), lit(b).as("band"),
          xxhash64(slice(col("signature"), b * r + 1, r)
            .cast("array<string>").cast("string"), lit(b)).as("bucket"))
      }.reduce(_ unionByName _).localCheckpoint(true)
      val sizes = bands.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("bsz")).localCheckpoint(true)
      time("bucket_histogram") {
        sizes.select(
          when(col("bsz") === 1, "1").when(col("bsz") <= 8, "2-8")
            .when(col("bsz") <= 64, "9-64").when(col("bsz") <= 256, "65-256")
            .when(col("bsz") <= 1024, "257-1024").otherwise(">1024").as("bin"),
          col("bsz"))
          .groupBy("bin")
          .agg(count(lit(1)).as("buckets"), sum(col("bsz")).as("docs"),
            sum(col("bsz") * (col("bsz") - 1) / 2).as("pairs_if_joined"))
          .orderBy(col("pairs_if_joined"))
          .collect().foreach(r => println(s"[scratch] bin=${r.get(0)} buckets=${r.get(1)} docs=${r.get(2)} pairs=${r.get(3)}"))
      }
      for (cap <- Seq(64, 256, 1024)) {
        val n = time(s"candidates_cap$cap") {
          graft.ops.Dedup.minHashCandidates(sigs, rowsPerBand = r,
            maxBucketSize = cap).count() }
        println(s"[scratch] cap=$cap candidates=$n")
      }
      // signature-agreement estimate distribution over the candidates:
      // how many survive an estimate >= {0.5, 0.6, 0.8} prefilter?
      val cand = graft.ops.Dedup.minHashCandidates(sigs, rowsPerBand = r,
        maxBucketSize = 256).localCheckpoint(true)
      val sl = sigs.localCheckpoint(true)
      val est = cand
        .join(sl.select(col("doc_id").as("doc_a"), col("signature").as("sa")), "doc_a")
        .join(sl.select(col("doc_id").as("doc_b"), col("signature").as("sb")), "doc_b")
        .select((aggregate(zip_with(col("sa"), col("sb"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / 16.0).as("est"))
      time("estimate_histogram") {
        est.select(
          when(col("est") < 0.25, "<0.25").when(col("est") < 0.5, "0.25-0.5")
            .when(col("est") < 0.6, "0.5-0.6").when(col("est") < 0.8, "0.6-0.8")
            .when(col("est") < 1.0, "0.8-1").otherwise("1").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n")).orderBy(col("bin"))
          .collect().foreach(rr => println(s"[scratch] est ${rr.get(0)}: ${rr.get(1)}"))
      }
      spark.stop()
      return
    }
    if (sys.env.get("SCRATCH_MODE").contains("dedupstage")) {
      // per-phase wall profile of ConversationDedup.conversationClusters
      // on the synthdup corpus (the --dedup stage the 20M manifest
      // under-credits: eager actions inside the builder are invisible
      // to the stage's write-wall)
      import org.apache.spark.sql.functions._
      val base = Main.loadTurns(spark, s"synthdup:$nTurns")
      val docs = time("p1_conversationDocs_ckpt") {
        graft.ops.ConversationDedup.conversationDocs(base).localCheckpoint(true) }
      time("p2_collision_guard") {
        val g = docs.agg(count(lit(1)), countDistinct(col("doc_id"))).head()
        require(g.getLong(0) == g.getLong(1)) }
      val sigs = time("p3_signatures_ckpt") {
        graft.ops.Dedup.minHashSignatures(docs.select(col("doc_id"), col("text")))
          .localCheckpoint(true) }
      val cand = time("p4_candidates_ckpt") {
        graft.ops.Dedup.minHashCandidates(sigs, rowsPerBand = 4,
          maxBucketSize = 256, minEstimate = 0.5).localCheckpoint(true) }
      println(s"[scratch] candidates=${cand.count()}")
      val verified = time("p5_jaccard_verify_ckpt") {
        graft.ops.Dedup.ngramJaccard(docs.select(col("doc_id"), col("text")),
            cand, minJaccard = 0.9)
          .filter(col("jaccard") >= 0.9)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .localCheckpoint(true) }
      println(s"[scratch] verified=${verified.count()}")
      val comp = time("p6_cc_ckpt") {
        graft.cc.ConnectedComponents.run(verified).localCheckpoint(true) }
      println(s"[scratch] comp=${comp.count()}")
      time("p7_verdict_joinback") {
        val v = docs.select(col("doc_id"))
          .join(comp.withColumnRenamed("sid", "doc_id").hint("merge"),
            Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("canon_id"))
          .join(docs.select(col("doc_id"), col("conv_id")).hint("merge"), "doc_id")
        println(s"[scratch] verdicts=${v.count()}") }
      spark.stop()
      return
    }
    if (sys.env.get("SCRATCH_MODE").contains("dedupverify")) {
      // sub-phase attribution of the Jaccard verify join (the 85% slice
      // of dedupstage): shingle materialization vs count-prefilter vs
      // the wide pair join
      import org.apache.spark.sql.functions._
      val base = Main.loadTurns(spark, s"synthdup:$nTurns")
      val docs = graft.ops.ConversationDedup.conversationDocs(base)
        .select(col("doc_id"), col("text")).localCheckpoint(true)
      val sigs = graft.ops.Dedup.minHashSignatures(docs).localCheckpoint(true)
      val cand = graft.ops.Dedup.minHashCandidates(sigs, rowsPerBand = 4,
        maxBucketSize = 256, minEstimate = 0.5).localCheckpoint(true)
      println(s"[scratch] candidates=${cand.count()}")
      def force(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      time("v1_shingle_scan_all_docs") {
        force(docs.select(col("doc_id"), graft.ops.Dedup.shingles(col("text")).as("sh"))) }
      time("v2_shingle_size_all_docs") {
        force(docs.select(col("doc_id"),
          size(graft.ops.Dedup.shingles(col("text"))).as("n_sh"))) }
      val ids = cand.select(col("doc_a").as("doc_id"))
        .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
      println(s"[scratch] participants=${ids.count()}")
      time("v3_full_verify_current") {
        force(graft.ops.Dedup.ngramJaccard(docs, cand, minJaccard = 0.9)
          .filter(col("jaccard") >= 0.9)) }
      time("v4_verify_pruned_docs") {
        val pruned = docs.join(ids.hint("merge"), Seq("doc_id"), "left_semi")
        force(graft.ops.Dedup.ngramJaccard(pruned, cand, minJaccard = 0.9)
          .filter(col("jaccard") >= 0.9)) }
      time("v5_verify_hashed_shingles") {
        val sh64 = docs.select(col("doc_id"),
          transform(graft.ops.Dedup.shingles(col("text")), s => xxhash64(s)).as("sh"))
        val j = cand
          .join(sh64.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")).hint("merge"), "doc_a")
          .join(sh64.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")).hint("merge"), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1))).as("jaccard"))
        force(j.filter(col("jaccard") >= 0.9)) }
      spark.stop()
      return
    }
    if (sys.env.get("SCRATCH_MODE").contains("parts")) {
      // partitioning audit of the materialized stage boundaries — a
      // 1-partition checkpoint is a serialization point (one 136s task
      // in a profiled bench run)
      val r = Pipeline.run(turns)
      for ((nm, df) <- Seq(
          "mentions" -> r.mentions.toDF(), "statements" -> r.statements.toDF(),
          "surfaces" -> r.surfaces, "components" -> r.components,
          "surfaceClusters" -> r.surfaceClusters,
          "memberships" -> r.memberships.toDF(),
          "prototypes" -> r.prototypes.toDF(),
          "superEdges" -> r.superEdges.toDF()))
        println(s"[scratch] $nm partitions=${df.rdd.getNumPartitions} rows=${df.count()}")
      // the membership JOIN plan as the pipeline builds it (pre-checkpoint)
      val m2 = Canonicalizer.memberships(r.mentions, r.surfaceClusters)
      m2.toDF().write.format("noop").mode("overwrite").save()
      println("[scratch] memberships executedPlan:\n" +
        m2.queryExecution.executedPlan.toString.take(4000))
      spark.stop()
      return
    }
    if (sys.env.get("SCRATCH_MODE").contains("outputs")) {
      // kg_full_outputs anatomy: force each justification/event output
      // separately (serial) or all at once (concurrent=1) to attribute
      // the cost; annotated cache build isolated first
      val r = Pipeline.run(turns)
      println(s"[scratch] triples=${r.triples.count()}")
      def force(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      if (sys.env.get("SCRATCH_CONCURRENT").contains("1")) {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val outs = Seq(r.eventPrototypes.toDF(), r.relationClusters,
          r.informativeJustifications, r.clusterLinks,
          r.protoJustifications, r.superEdgeJustifications)
        time("all_outputs_concurrent") {
          Await.result(Future.sequence(outs.map(df => Future(force(df)))), Duration.Inf)
        }
      } else if (sys.env.get("SCRATCH_VARIANT").contains("ab")) {
        // in-session A/B, D-A-D ordering to control JIT: D = checkpoint
        // the shared join; A = lazily persist it (the Result path)
        def runD(tag: String): Unit = {
          val ann = time(s"${tag}_annotated_ckpt")(graft.canon.Justifications
            .annotatedMembers(r.memberships, r.mentions).localCheckpoint(true))
          time(s"${tag}_clusterLinks")(force(graft.canon.Justifications.clusterLinksFrom(ann)))
          time(s"${tag}_infJust")(
            force(graft.canon.Justifications.informativeJustificationsFrom(ann)))
          time(s"${tag}_protoJust")(
            force(graft.canon.Justifications.prototypeJustificationsFrom(ann, r.prototypes)))
          graft.util.Blocks.release(ann)
        }
        def runA(tag: String): Unit = {
          val ann = graft.canon.Justifications
            .annotatedMembers(r.memberships, r.mentions)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          time(s"${tag}_annotated_persist")(force(ann))
          time(s"${tag}_clusterLinks")(force(graft.canon.Justifications.clusterLinksFrom(ann)))
          time(s"${tag}_infJust")(
            force(graft.canon.Justifications.informativeJustificationsFrom(ann)))
          time(s"${tag}_protoJust")(
            force(graft.canon.Justifications.prototypeJustificationsFrom(ann, r.prototypes)))
          ann.unpersist(true)
        }
        runD("d1"); runA("a1"); runD("d2"); runA("a2")
      } else if (sys.env.get("SCRATCH_VARIANT").contains("ckpt")) {
        // D: annotated via eager localCheckpoint instead of persist()
        val ann = time("annotated_ckpt") {
          val a = graft.canon.Justifications
            .annotatedMembers(r.memberships, r.mentions).localCheckpoint(true)
          a
        }
        time("clusterLinks")(force(graft.canon.Justifications.clusterLinksFrom(ann)))
        time("informativeJustifications")(
          force(graft.canon.Justifications.informativeJustificationsFrom(ann)))
        time("protoJustifications")(
          force(graft.canon.Justifications.prototypeJustificationsFrom(ann, r.prototypes)))
        graft.util.Blocks.release(ann)
      } else if (sys.env.get("SCRATCH_VARIANT").contains("plain")) {
        // B: no sharing at all — each output re-joins
        time("clusterLinks")(
          force(graft.canon.Justifications.clusterLinks(r.memberships, r.mentions)))
        time("informativeJustifications")(
          force(graft.canon.Justifications.informativeJustifications(r.memberships, r.mentions)))
        time("protoJustifications")(force(graft.canon.Justifications
          .prototypeJustifications(r.memberships, r.mentions, r.prototypes)))
      } else {
        time("annotated_build")(force(r.annotatedMembers))
        time("clusterLinks")(force(r.clusterLinks))
        time("informativeJustifications")(force(r.informativeJustifications))
        time("protoJustifications")(force(r.protoJustifications))
        time("eventPrototypes")(force(r.eventPrototypes.toDF()))
        time("relationClusters")(force(r.relationClusters))
        time("superEdgeJustifications")(force(r.superEdgeJustifications))
      }
      r.unpersist()
      spark.stop()
      return
    }
    if (sys.env.get("SCRATCH_MODE").contains("kewrite")) {
      // attribute the ke snapshot stage (the 20M --dedup profile's
      // dominant 203s): synth+extract vs the 71M-row parquet write, and
      // the write under each codec — D-A-D-A within one JVM so the
      // comparison is weather-fair. Codec choice is a 100TB design
      // point: tmpfs here, HDFS/S3 there.
      val ke = Main.extractKe(turns)
      for (round <- 1 to 2; codec <- Seq("snappy", "zstd", "lz4", "uncompressed")) {
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        val dir = s"/tmp/scratch-ke-$codec"
        time(s"ke_write_${codec}_r$round") {
          ke.write.mode("overwrite").parquet(dir)
        }
        val bytes = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
        println(f"[scratch] ke_${codec}_bytes=${bytes / 1e6}%.1fMB")
      }
      time("ke_compute_only_noop") {
        ke.write.format("noop").mode("overwrite").save()
      }
      time("ke_compute_only_noop_2") {
        ke.write.format("noop").mode("overwrite").save()
      }
      // read-back matters more than write: downstream stages scan the
      // ke snapshot 4-5× (mentions/statements/events/eventArgs views)
      for (round <- 1 to 2; codec <- Seq("snappy", "zstd", "lz4", "uncompressed")) {
        val df = spark.read.parquet(s"/tmp/scratch-ke-$codec")
        time(s"ke_read_${codec}_r$round") {
          df.write.format("noop").mode("overwrite").save()
        }
      }
      spark.stop()
      return
    }
    if (sys.env.get("SCRATCH_MODE").contains("bench")) {
      val n = time("pipeline_end_to_end") {
        Pipeline.run(TranscriptSynth.turnsDs(spark, cfg, partitions = cores * 2))
          .triples.count()
      }
      println(s"[scratch] triples=$n")
      spark.stop()
      return
    }
    val turnsP = turns.persist()
    val mentions = turnsP.flatMap(t => MentionExtractor.extractTurn(t).mentions).persist()
    println(s"[scratch] mentions=${time("mentions.count")(mentions.count())}")
    val statements = turnsP.flatMap(t => MentionExtractor.extractTurn(t).statements).persist()
    println(s"[scratch] statements=${time("statements.count")(statements.count())}")
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
