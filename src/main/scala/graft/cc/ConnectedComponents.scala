package graft.cc

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Connected components over a Dataset edge list via iterative
 * min-label propagation (the GraphFrames-style driver loop called for
 * in SURVEY.md §2.4/§4.3.1 — GraphFrames itself is not on the offline
 * classpath).
 *
 * Each round: every vertex adopts the minimum component label among
 * itself and its neighbors; convergence when no label changes.
 * Rounds = graph diameter. Entity-resolution match graphs are unions
 * of near-cliques (every alias pair of a family scores against the
 * shared informative token), so diameter is small (≤ ~4) regardless of
 * corpus size — label propagation converges in a handful of rounds
 * where star-contraction's worst-case machinery isn't needed. Lineage
 * is truncated every round with an eager localCheckpoint so the plan
 * stays O(1) deep; `maxIter` bounds pathological inputs.
 *
 * Scale notes: per round, one shuffle join (edges ⋈ labels, both
 * hash-partitioned on the join key and re-usable across rounds) and
 * one min-aggregation. Skewed high-degree vertices are absorbed by
 * partial aggregation of min() before the shuffle.
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
      .distinct()

  def run(edges: DataFrame, maxIter: Int = 30,
      broadcastableVertices: Long = 250000L): DataFrame = {
    // localCheckpoint (not just persist): persist caches the DATA but
    // the logical plan — the entire upstream linker DAG — would still
    // be embedded in, and re-planned for, every iteration's job;
    // checkpointing makes each round's plan O(1) regardless of how
    // edges were produced
    val sym = symmetric(edges).localCheckpoint(true)
    var labels = sym.select(col("src").as("sid")).distinct()
      .withColumn("component", col("sid"))
      .localCheckpoint(true)
    // size-gated join strategy (round 6, guide §3.1): the label /
    // neighbor-min frames are O(vertices); when the graph is small the
    // per-round joins broadcast the known-small side EXPLICITLY (never
    // trusting checkpoint-descended size estimates — the
    // compile-time-broadcast hazard, graft.superedge.SuperEdges) and
    // each round stops paying two shuffle+sort pairs. A huge graph
    // (10^8 surfaces at contract scale) takes the identical
    // pre-round-6 merge-hinted plan. The count is a cheap metadata-ish
    // job over the just-checkpointed labels.
    val small = labels.count() <= broadcastableVertices
    def bc(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df.hint("merge")
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbor-min, carrying the previous label so convergence is a
      // free filter on the checkpointed result (no extra shuffle join)
      val minMsgs = sym
        // bc(): explicit broadcast under the vertex gate, merge hint
        // above it — broadcast would OOM at contract scale, and
        // checkpoint size estimates can't be trusted (see
        // graft.superedge.SuperEdges)
        .join(bc(labels), sym("src") === labels("sid"))
        .groupBy(col("dst"))
        .agg(min(col("component")).as("mc"))
      // checkpoint BEFORE the self-join below: self-joining the raw
      // join+agg subtree trips Catalyst union-constraint rewriting
      val prop = labels
        .join(bc(minMsgs), labels("sid") === minMsgs("dst"), "left_outer")
        .select(labels("sid"), col("component").as("old"),
          least(col("component"), col("mc")).as("component")) // least skips nulls
        .localCheckpoint(true)
      // pointer jumping: l(v) ← l(l(v)) — with the neighbor-min step
      // this converges in O(log n) rounds even on path graphs, not
      // O(diameter)
      val propRight = prop
        .select(col("sid").as("y_sid"), col("component").as("y_component"))
      // convergence test FUSED into the checkpoint job via observe():
      // the changed-label count rides the same pass that materializes
      // the round — no third job per round
      val obs = Observation(s"cc_changed_$iter")
      val next = prop
        .join(bc(propRight), col("component") === col("y_sid"), "left_outer")
        .select(col("sid"), col("old"),
          coalesce(col("y_component"), col("component")).as("component"))
        .observe(obs, coalesce(sum(
          when(col("old") =!= col("component"), 1L).otherwise(0L)), lit(0L))
          .as("changed"))
        .localCheckpoint(true)
      changed = obs.get("changed").asInstanceOf[Long]
      // `next` is materialized (the observe rode its checkpoint job):
      // the round's intermediate `prop` blocks and the PREVIOUS round's
      // labels are now dead — release them so a deep loop doesn't pin
      // O(rounds) copies of the vertex set (Dataset GC frees them
      // eventually, but at scale "eventually" is after the heap
      // pressure already hurt)
      graft.util.Blocks.release(prop)
      graft.util.Blocks.release(labels)
      labels = next.select(col("sid"), col("component"))
      iter += 1
    }
    // the symmetric edge list served its last round
    graft.util.Blocks.release(sym)
    labels
  }
}
