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
      threshold: Double = 0.45,
      maxBlock: Int = 1000,
      minTokenLen: Int = 2)

  /** Distinct surface forms with a dense, deterministic Long id.
    * Output columns: sid, etype, norm_name, link_target, n_mentions.
    * Ids are ranks in the global sort of the surface key — stable
    * across runs and parallelism levels (determinism contract,
    * SURVEY.md §7.4). */
  def surfaces(mentions: Dataset[Mention]): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val surf = mentions.toDF()
      .filter($"kind" === "entity")
      .groupBy($"etype", $"norm_name", $"link_target")
      .agg(count(lit(1)).as("n_mentions"))
      .withColumn("skey",
        concat_ws("", $"etype", $"norm_name", coalesce($"link_target", lit(""))))
    // global-sort rank → dense Long id (deterministic for distinct keys)
    val ids = surf.select($"skey").as[String].rdd
      .sortBy(identity).zipWithIndex()
      .toDF("skey", "sid")
    surf.join(ids, "skey")
  }

  /** Per-surface weighted token vectors. Tokens carry IDF weights
    * computed over the surface universe; single-letter initials
    * ("j." → "j#i") and first letters of full tokens are emitted as
    * pseudo-tokens so "J. Smith" ≈ "John Smith" without any special
    * pair-time logic. */
  private[link] def tokenVectors(surf: DataFrame, cfg: Config): DataFrame = {
    val spark = surf.sparkSession
    import spark.implicits._
    val raw = surf
      .select($"sid", $"etype", explode(split($"norm_name", " ")).as("tok0"))
      .withColumn("tok", regexp_replace($"tok0", "[^a-z0-9]", ""))
      .filter(length($"tok") >= 1)
    val real = raw.filter(length($"tok") >= cfg.minTokenLen)
      .select($"sid", $"etype", $"tok", lit(1.0).as("scale"))
    val initials = raw
      .select($"sid", $"etype", concat(substring($"tok", 1, 1), lit("#i")).as("tok"),
        lit(0.6).as("scale"))
    val toks = real.unionByName(initials)
      .groupBy($"sid", $"etype", $"tok").agg(max($"scale").as("scale"))
    val n = surf.count()
    val df = toks.groupBy($"tok").agg(countDistinct($"sid").as("df"))
    toks.join(df, "tok")
      .withColumn("w", $"scale" * log(lit(1.0) + lit(n.toDouble) / $"df"))
      .select($"sid", $"etype", $"tok", $"w")
  }

  /** Candidate pairs (sid1 < sid2) from two blocking-key families:
    * (etype, informative token) and non-NIL (etype, link_target).
    * Oversized blocks are dropped (cap), bounding join fan-out — the
    * explicit skew defense on hot names (SURVEY.md §7.4.3). */
  private[link] def candidatePairs(surf: DataFrame, toks: DataFrame, cfg: Config): DataFrame = {
    val spark = surf.sparkSession
    import spark.implicits._
    val tokKeys = toks
      .filter(length($"tok") >= cfg.minTokenLen && !$"tok".endsWith("#i"))
      .select($"sid", concat_ws("", $"etype", $"tok").as("bkey"))
    val linkKeys = surf.filter($"link_target".isNotNull)
      .select($"sid", concat_ws("", $"etype", lit("L:"), $"link_target").as("bkey"))
    val keys = tokKeys.unionByName(linkKeys)
    val sizes = keys.groupBy($"bkey").agg(count(lit(1)).as("bsz"))
      .filter($"bsz" >= 2 && $"bsz" <= cfg.maxBlock)
    val kept = keys.join(sizes, "bkey").select($"bkey", $"sid")
    kept.as("a").join(kept.as("b"), $"a.bkey" === $"b.bkey" && $"a.sid" < $"b.sid")
      .select($"a.sid".as("sid1"), $"b.sid".as("sid2"))
      .distinct()
  }

  /** TF-IDF cosine over shared tokens, computed as a distributed
    * token join (dot product) against precomputed norms. */
  private[link] def score(pairs: DataFrame, toks: DataFrame): DataFrame = {
    val norms = toks.groupBy(col("sid")).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val t1 = toks.select(col("sid").as("sid1"), col("tok"), col("w").as("w1"))
    val t2 = toks.select(col("sid").as("sid2"), col("tok"), col("w").as("w2"))
    pairs
      .join(t1, "sid1")
      .join(t2, Seq("sid2", "tok"))
      .groupBy(col("sid1"), col("sid2"))
      .agg(sum(col("w1") * col("w2")).as("dot"))
      .join(norms.withColumnRenamed("sid", "sid1").withColumnRenamed("nrm", "n1"), "sid1")
      .join(norms.withColumnRenamed("sid", "sid2").withColumnRenamed("nrm", "n2"), "sid2")
      .select(col("sid1"), col("sid2"), (col("dot") / (col("n1") * col("n2"))).as("score"))
  }

  /** Match edges: cosine ≥ threshold, or exact non-NIL link-target
    * equality (the strong EDL signal — reference linkTarget feature). */
  def matchEdges(mentions: Dataset[Mention], cfg: Config = Config()): (DataFrame, Dataset[MatchEdge]) = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val surf = surfaces(mentions)
    val toks = tokenVectors(surf, cfg)
    val pairs = candidatePairs(surf, toks, cfg)
    val scored = score(pairs, toks)
    val linkPairs = {
      val l = surf.filter($"link_target".isNotNull)
        .select($"sid", $"etype", $"link_target")
      l.as("a").join(l.as("b"),
          $"a.etype" === $"b.etype" && $"a.link_target" === $"b.link_target" &&
            $"a.sid" < $"b.sid")
        .select($"a.sid".as("sid1"), $"b.sid".as("sid2"))
    }
    val edges = scored.filter($"score" >= cfg.threshold)
      .select($"sid1", $"sid2")
      .unionByName(linkPairs)
      .distinct()
      .select($"sid1".as("src"), $"sid2".as("dst"))
      .as[MatchEdge]
    (surf, edges)
  }
}
