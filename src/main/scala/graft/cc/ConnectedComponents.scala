package graft.cc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Connected components over a Dataset edge list via alternating
 * large-star / small-star contraction (the MapReduce CC algorithm of
 * Kiveris et al., "Connected Components in MapReduce and Beyond" —
 * the same family GraphFrames uses; GraphFrames itself is not on the
 * offline classpath, SURVEY.md §4.3.1).
 *
 * Converges in O(log²) rounds on adversarial graphs and 1-3 rounds on
 * the near-clique match graphs entity linking produces. Each round is
 * two shuffles; lineage is truncated per round with localCheckpoint
 * so plans don't grow unboundedly (driver-loop-over-Datasets pattern,
 * SURVEY.md §4.3).
 *
 * Input:  edges(src: Long, dst: Long), undirected, self-loops ignored.
 * Output: (sid: Long, component: Long) for every vertex appearing in
 * an edge; component = min vertex id of the component. Isolated
 * vertices are absent (singleton synthesis is the canonicalizer's
 * anti-join, matching /root/reference/update_kg/Updater.py:172-201).
 */
object ConnectedComponents {

  private def symmetric(e: DataFrame): DataFrame =
    e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))

  /** large-star: connect every strictly-larger neighbor of u to
    * m = min(Γ(u) ∪ {u}). */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = symmetric(e)
    val mins = nbrs.groupBy(col("src"))
      .agg(least(min(col("dst")), first(col("src"))).as("m"))
    nbrs.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** small-star: connect every smaller-or-equal neighbor (and u) to
    * m = min(Γ≤(u) ∪ {u}). */
  private def smallStar(e: DataFrame): DataFrame = {
    val nbrs = symmetric(e).filter(col("dst") < col("src"))
    val mins = nbrs.groupBy(col("src")).agg(min(col("dst")).as("m"))
    val moved = nbrs.join(mins, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
    val self = mins.select(col("src"), col("m").as("dst"))
    moved.union(self)
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  private def signature(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("c"),
      coalesce(sum(xxhash64(col("src"), col("dst"))), lit(0L)).as("h"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  /** @return vertex → component-min assignment for all edge-covered
    *         vertices. */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark: SparkSession = edges.sparkSession
    var e = edges.filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var sig = signature(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextSig = signature(next)
      e.unpersist(false)
      e = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    // after convergence the edge set is a union of stars rooted at the
    // component minimum; read off the assignment (root maps to itself)
    val assign = symmetric(e).groupBy(col("src")).agg(min(col("dst")).as("component"))
      .select(col("src").as("sid"),
        least(col("component"), col("src")).as("component"))
    assign
  }
}
