package graft.link

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema.{MatchEdge, Mention}

/**
 * Cross-document entity linking: blocking-key candidate generation +
 * TF-IDF cosine scoring over surface-name tokens → match edges.
 *
 * Replaces the reference's externalized `gaia-clustering` submodule
 * using exactly the features its contract exposes (SURVEY.md §2.4;
 * json heads carry name/type/linkTarget,
 * /root/reference/update_kg/Updater.py:302-321). NIL link targets
 * never block-match (the reference's DUMMY:%d semantics,
 * json_head/get_json_head.py:18-20).
 *
 * Scale design (10^12 mentions): all pairwise work happens on
 * DISTINCT SURFACE FORMS (etype, norm_name, link_target) — orders of
 * magnitude smaller than mentions — never on raw mentions. Blocks are
 * hard-capped (maxBlock) so candidate generation is O(Σ|block|²) with
 * bounded |block|; scoring is a token-level distributed join (no
 * driver-side vocabulary, no broadcast of unbounded state).
 */
object Linker {

  final case class Config(
      threshold: Double = 0.65,
      maxBlock: Int = 1000,
      minTokenLen: Int = 2,
      /** Surface-count gate for the join strategy inside this stage
        * (round-6, guide §3.1): at or below it every linker-internal
        * frame (token vectors, doc freqs, norms, block sizes — all
        * O(nSurf) narrow rows) is genuinely broadcastable, so the
        * known-small side is broadcast EXPLICITLY — never left to
        * checkpoint-descended size estimates, which undercount (the
        * compile-time-broadcast hazard, see graft.superedge.SuperEdges)
        * — collapsing ~25 merge-hinted shuffle+sorts of tiny frames
        * into a handful of shuffles. Above it, the always-safe merge
        * hints pin sort-merge exactly as before: a 100-TB corpus with
        * 10^8 distinct surfaces takes the identical pre-round-6 plan.
        * 250k surfaces ≈ ≤1M token rows ≈ tens of MB broadcast. */
      broadcastableSurfaces: Long = 250000L)

  /** Per-call join-strategy knobs derived from the measured surface
    * count: `bc(df)` marks a provably-O(nSurf) side broadcast when the
    * dictionary is small; `mh(df)` applies the merge hint only when it
    * is huge. */
  private[link] final case class JoinMode(small: Boolean) {
    def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df.hint("merge")
    def mh(df: DataFrame): DataFrame = if (small) df else df.hint("merge")
  }

  /** Distinct surface forms with a deterministic Long id.
    * Output columns: sid, etype, norm_name, link_target, n_mentions,
    * skey. Ids are xxhash64 of the unambiguous surface key — a pure
    * codegen projection (no global sort, no RDD round-trip), stable
    * across runs and parallelism levels (determinism contract,
    * SURVEY.md §7.4). The key joins its fields with \u0001 (escape) and maps a
    * NULL link_target to a \u0002-escape sentinel, so distinct tuples never
    * collide into one key and null stays distinct from "". 64-bit id
    * collisions are vanishingly rare below ~10^9 distinct surfaces;
    * [[matchEdges]] checks countDistinct(sid)==count(*) on the same
    * job that computes the IDF corpus size and fails loudly rather
    * than silently merging. */
  def surfaces(mentions: Dataset[Mention]): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions.toDF()
      .filter($"kind" === "entity")
      .groupBy($"etype", $"norm_name", $"link_target")
      .agg(count(lit(1)).as("n_mentions"))
      .withColumn("skey",
        concat_ws("\u0001", $"etype", $"norm_name",
          coalesce($"link_target", lit("\u0002"))))
      .withColumn("sid", xxhash64($"skey"))
  }

  /** Per-surface weighted token vectors over SORTED-CHAR-MULTISET
    * keys ("cyberdyne" and its transposition typo "cybredyne" map to
    * the same key — typo-invariant matching with no edit-distance
    * pass), IDF-weighted over the surface universe. Anagram
    * collisions between distinct real words are rare and additionally
    * gated by the cosine threshold + etype blocking. */
  private[link] def tokenVectors(surf: DataFrame, cfg: Config,
      nSurfaces: Long): DataFrame = {
    val jm = JoinMode(nSurfaces <= cfg.broadcastableSurfaces)
    val spark = surf.sparkSession
    import spark.implicits._
    val toks = surf
      .select($"sid", $"etype", explode(split($"norm_name", " ")).as("tok0"))
      .withColumn("tokc", regexp_replace($"tok0", "[^a-z0-9]", ""))
      .filter(length($"tokc") >= 1)
      .select($"sid", $"etype",
        // single-letter tokens ("j." initials) become distinguishing
        // "i:<ch>" tokens — two different-initial abbreviations of the
        // same last name must NOT have identical vectors
        when(length($"tokc") >= cfg.minTokenLen,
          concat(lit("s:"), array_join(array_sort(split($"tokc", "")), "")))
          .otherwise(concat(lit("i:"), $"tokc")).as("tok"))
      .distinct()
    val df = toks.groupBy($"tok").agg(countDistinct($"sid").as("df"))
    toks.join(jm.bc(df), "tok")
      .withColumn("w", log(lit(1.0) + lit(nSurfaces.toDouble) / $"df"))
      .select($"sid", $"etype", $"tok", $"w")
  }

  /** Candidate pairs (sid1 < sid2) from two blocking-key families:
    * (etype, informative token) and non-NIL (etype, link_target).
    * Oversized blocks are dropped (cap), bounding join fan-out — the
    * explicit skew defense on hot names (SURVEY.md §7.4.3). */
  private[link] def candidatePairs(surf: DataFrame, toks: DataFrame, cfg: Config,
      jm: JoinMode = JoinMode(false)): DataFrame = {
    val spark = surf.sparkSession
    import spark.implicits._
    val tokKeys = toks
      .filter($"tok".startsWith("s:")) // initial tokens don't block-match
      .select($"sid", concat_ws("\u0001", $"etype", $"tok").as("bkey"))
    val linkKeys = surf.filter($"link_target".isNotNull)
      .select($"sid", concat_ws("\u0001", $"etype", lit("L:"), $"link_target").as("bkey"))
    val keys = tokKeys.unionByName(linkKeys)
    val sizes = keys.groupBy($"bkey").agg(count(lit(1)).as("bsz"))
      .filter($"bsz" >= 2 && $"bsz" <= cfg.maxBlock)
    val kept = keys.join(jm.bc(sizes), "bkey").select($"bkey", $"sid")
    kept.as("a").join(jm.mh(kept.as("b")), $"a.bkey" === $"b.bkey" && $"a.sid" < $"b.sid")
      .select($"a.sid".as("sid1"), $"b.sid".as("sid2"))
      .distinct()
  }

  /** TF-IDF cosine over shared tokens, computed as a distributed
    * token join (dot product) against precomputed norms. */
  private[link] def score(pairs: DataFrame, toks: DataFrame,
      jm: JoinMode = JoinMode(false)): DataFrame = {
    val norms = toks.groupBy(col("sid")).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val t1 = toks.select(col("sid").as("sid1"), col("tok"), col("w").as("w1"))
    val t2 = toks.select(col("sid").as("sid2"), col("tok"), col("w").as("w2"))
    pairs
      .join(jm.bc(t1), "sid1")
      .join(jm.bc(t2), Seq("sid2", "tok"))
      .groupBy(col("sid1"), col("sid2"))
      .agg(sum(col("w1") * col("w2")).as("dot"))
      .join(jm.bc(norms.withColumnRenamed("sid", "sid1").withColumnRenamed("nrm", "n1")), "sid1")
      .join(jm.bc(norms.withColumnRenamed("sid", "sid2").withColumnRenamed("nrm", "n2")), "sid2")
      .select(col("sid1"), col("sid2"), (col("dot") / (col("n1") * col("n2"))).as("score"))
  }

  /** Abbreviation edges for persons: "J. Smith" ≡ "John Smith" iff
    * the abbreviation keys (first-initial | rest-of-name) are equal
    * AND at least one side is actually an initial form — two distinct
    * full first names sharing an initial never merge this way. */
  private[link] def abbrevPairs(surf: DataFrame,
      jm: JoinMode = JoinMode(false)): DataFrame = {
    val spark = surf.sparkSession
    import spark.implicits._
    val first = regexp_replace(split($"norm_name", " ")(0), "[^a-z0-9]", "")
    val rest = concat_ws(" ", slice(split($"norm_name", " "), 2, 1000))
    val persons = surf
      .filter($"etype" === lit(graft.extract.Lexicon.PER) &&
        size(split($"norm_name", " ")) >= 2)
      .select($"sid",
        concat(substring(first, 1, 1), lit("|"), rest).as("akey"),
        // sorted-char signature: typo variants of the same first name
        // count as ONE expansion, not two
        array_join(array_sort(split(first, "")), "").as("fkey"),
        (length(first) === 1).as("isInitial"))
    // ambiguity guard: an initial form attaches to a full form only
    // when exactly ONE distinct full-name expansion exists for its key
    // ("M. Smith" with both "Maria Smith" and "Marco Smith" present
    // stays unresolved instead of chain-merging two real entities)
    val fulls = persons.filter(!$"isInitial").select($"sid", $"akey", $"fkey")
    val uniqueFulls = fulls.groupBy($"akey")
      .agg(countDistinct($"fkey").as("nfull"), min($"sid").as("fsid"))
      .filter($"nfull" === 1)
    persons.filter($"isInitial").select($"sid", $"akey")
      .join(jm.bc(uniqueFulls), "akey")
      .filter($"sid" =!= $"fsid")
      .select(least($"sid", $"fsid").as("sid1"), greatest($"sid", $"fsid").as("sid2"))
  }

  /** Match edges: cosine ≥ threshold, exact non-NIL link-target
    * equality (the strong EDL signal — reference linkTarget feature),
    * or person-abbreviation key equality. */
  def matchEdges(mentions: Dataset[Mention], cfg: Config = Config()): (DataFrame, Dataset[MatchEdge]) = {
    // checkpoint the fan-out point: surf feeds 4 consumers. Eager
    // localCheckpoint (not persist) both reuses the data AND truncates
    // the plan, so downstream actions don't re-optimize the whole
    // extraction+id-assignment tree each time.
    val surf = graft.util.StageTiming.timed("linker_surfaces") {
      surfaces(mentions).localCheckpoint(true) }
    (surf, matchEdgesFrom(surf, cfg))
  }

  /** Match edges from a precomputed (checkpointed or snapshot-read)
    * surface table — resumable-pipeline entry that avoids recomputing
    * [[surfaces]]. */
  def matchEdgesFrom(surf: DataFrame, cfg: Config = Config()): Dataset[MatchEdge] = {
    val spark = surf.sparkSession
    import spark.implicits._
    // one job: IDF corpus size + the xxhash64 sid collision guard
    val sizes = graft.util.StageTiming.timed("linker_sizes") {
      surf.agg(count(lit(1)), countDistinct($"sid")).head() }
    val (nSurf, nSid) = (sizes.getLong(0), sizes.getLong(1))
    require(nSurf == nSid,
      s"surface id hash collision: $nSurf surfaces, $nSid distinct sids")
    val jm = JoinMode(nSurf <= cfg.broadcastableSurfaces)
    val toks = graft.util.StageTiming.timed("linker_toks") {
      tokenVectors(surf, cfg, nSurf).localCheckpoint(true) }
    val pairs = candidatePairs(surf, toks, cfg, jm)
    // suffix veto: "acme corp" vs "acme group" share a rare stem but
    // denote different organizations — when both names end in a known
    // (already synonym-normalized) org suffix and the suffixes differ,
    // the pair can never match on cosine alone
    val sufList = graft.extract.Lexicon.orgSuffixes.toSeq.map(graft.extract.Lexicon.normToken).distinct
    def sufOf(c: org.apache.spark.sql.Column) = {
      val last = element_at(split(c, " "), -1)
      when(last.isin(sufList: _*), last)
    }
    val sufs = surf.select($"sid", sufOf($"norm_name").as("suf"))
    val scored = score(pairs, toks, jm)
      .join(jm.bc(sufs.withColumnRenamed("sid", "sid1").withColumnRenamed("suf", "suf1")), "sid1")
      .join(jm.bc(sufs.withColumnRenamed("sid", "sid2").withColumnRenamed("suf", "suf2")), "sid2")
      .filter($"suf1".isNull || $"suf2".isNull || $"suf1" === $"suf2")
    // star edges, not all-pairs: connected components only needs
    // connectivity, so each (etype, link_target) group links every
    // surface to the group's min-sid representative — O(k) edges per
    // group where the quadratic self-join emitted k², the uncapped
    // skew hole a hot KB target would otherwise open.
    val linkPairs = {
      val l = surf.filter($"link_target".isNotNull)
        .select($"sid", $"etype", $"link_target")
      val reps = l.groupBy($"etype", $"link_target")
        .agg(min($"sid").as("rep"), count(lit(1)).as("gsz"))
        .filter($"gsz" >= 2)
        .drop("gsz")
      l.join(jm.bc(reps), Seq("etype", "link_target"))
        .filter($"sid" =!= $"rep")
        .select(least($"sid", $"rep").as("sid1"),
          greatest($"sid", $"rep").as("sid2"))
    }
    val edges = graft.util.StageTiming.timed("linker_edges") { scored.filter($"score" >= cfg.threshold)
      .select($"sid1", $"sid2")
      .unionByName(linkPairs)
      .unionByName(abbrevPairs(surf, jm))
      .distinct()
      .select($"sid1".as("src"), $"sid2".as("dst"))
      .as[MatchEdge]
      // materialize the (small, surface-scale) edge list so the token-
      // vector checkpoint — reachable only through this plan — can be
      // released HERE instead of pinning TF-IDF vectors for the rest of
      // the session (every caller forces the edge list immediately:
      // connected components' first round, or the snapshot write)
      .localCheckpoint(true) }
    graft.util.Blocks.release(toks)
    edges
  }
}
