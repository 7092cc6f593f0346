package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step that turns pairwise near-duplicate DETECTION (TextDedup /
  * Similarity pair miners) into usable dedup CLUSTERS (keep one doc per
  * component, not per pair).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
  * is two equi-join + min-aggregate passes over the edge list — no
  * vertex-program framework, no driver-side graph — and the edge set
  * provably converges to per-component stars (every node pointing at
  * its component minimum) in O(log² n) rounds, in practice a handful.
  *
  * 100 TB scale notes:
  * - State per round is ONE edge DataFrame of (Long, Long); document
  *   bodies never enter the operator. Near-dup graphs are sparse
  *   (edges ≪ docs), so the per-round shuffle is tiny relative to the
  *   corpus scans that produced the pairs.
  * - Each round's result is persisted and the previous round released —
  *   the loop holds at most two edge sets, and lineage is cut by the
  *   persist so round k does not re-execute rounds 1..k-1.
  * - Convergence is an `except(...).isEmpty` check per round — one
  *   extra shuffle of the (small) edge set, bounded by the O(log² n)
  *   round count.
  */
object ConnectedComponents {

  /** Large-star: for every node u (both orientations), let
    * m = min(N(u) ∪ {u}); connect every STRICTLY LARGER neighbor
    * v > u to m. Keeps component minima reachable while collapsing
    * long chains toward small ids. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: orient every edge toward its smaller endpoint, let
    * m = min(smaller-neighbors ∪ {u}); connect u and each smaller
    * neighbor to m. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val nbrs = edges
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = nbrs.groupBy("u").agg(min(col("v")).as("m"))
    val reattached = nbrs.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = mins.select(col("u"), col("m").as("v"))
    reattached.union(self).distinct()
  }

  /** Component assignment for every node appearing in `edges` (two Long
    * columns `u`, `v`, undirected; self-loops ignored). Returns
    * (id, component) where component = the minimum node id in the
    * connected component. Nodes with no surviving edge (only
    * self-loops) map to themselves. */
  def assign(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val nodes = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id"))).distinct()
    var cur = edges
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()
    var converged = cur.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(cur)).persist()
      // star-shaped fixpoint: the round changed nothing
      converged = next.except(cur).isEmpty && cur.except(next).isEmpty
      cur.unpersist()
      cur = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    // At the fixpoint every edge is (member, component-min). The final
    // edge set is already materialized in cache by the convergence
    // check; hand its lifecycle to CacheScope (unpersisting here would
    // re-execute the whole iteration chain when the result is read).
    graft.CacheScope.track(cur)
    val roots = cur.groupBy(col("u").as("id")).agg(min(col("v")).as("comp"))
    nodes.join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component"))
  }
}
