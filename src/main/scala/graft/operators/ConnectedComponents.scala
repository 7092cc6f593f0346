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
  * - Each round is cut with a LAZY `localCheckpoint` materialized by
  *   its `count()` — one job per round — instead of a persist: a
  *   persist caches data but the logical plan still grows by ~6
  *   operators per round, and Catalyst re-analyzes the whole
  *   accumulated plan every iteration — driver-side analysis, not
  *   execution, dominated the loop (the GraphFrames CC implementation
  *   checkpoints for the same reason). The checkpoint pins plans at
  *   constant size, so round k costs the same as round 1.
  * - Convergence: the edge sets are canonical (distinct, oriented
  *   big→small), so |next| ≠ |cur| proves change with no extra job
  *   (the count doubles as the checkpoint materialization), and a
  *   single one-direction `except` only runs on the count-equal round:
  *   equal cardinality + next ⊆ cur ⇒ set equality.
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
    // no distinct here: duplicate edges cannot change smallStar's min
    // aggregates, and smallStar ends in a distinct that re-canonicalizes
    // — dropping it removes one full shuffle per round
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
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

  /** localCheckpoint data lives on the materialized RDD, not in the
    * CacheManager, so Dataset.unpersist is a no-op for it — release the
    * blocks deterministically through the LogicalRDD leaf instead of
    * waiting for ContextCleaner GC. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Component assignment for every node appearing in `edges` (two Long
    * columns `u`, `v`, undirected; self-loops ignored). Returns
    * (id, component) where component = the minimum node id in the
    * connected component. Nodes with no surviving edge (only
    * self-loops) map to themselves. */
  def assign(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // LAZY localCheckpoint + count(): ONE job both materializes the
    // checkpoint and returns its size. The checkpoint replaces the
    // logical plan with a constant-size leaf, so per-round Catalyst
    // analysis cost does not grow with the iteration count.
    // `base` is the only pass over the input: edge miners feeding this
    // operator (Jaccard/LSH pair joins) are expensive, and both the
    // iteration seed and the final node set derive from the checkpoint,
    // not from a second scan of `edges`.
    val base = edges
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    graft.CacheScope.track(base)
    base.count()
    val nodes = base.select(col("u").as("id"))
      .union(base.select(col("v").as("id"))).distinct()
    var cur = base.filter(col("u") =!= col("v"))
      .localCheckpoint(eager = false)
    var curCount = cur.count()
    var converged = curCount == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint(eager = false)
      val nextCount = next.count()
      // both sides are canonical distinct sets: a size change proves
      // the round changed something with no extra job; on equal sizes,
      // next ⊆ cur ⇔ equality
      converged = nextCount == curCount && next.except(cur).isEmpty
      releaseCheckpoint(cur)
      cur = next
      curCount = nextCount
      iter += 1
    }
    if (!converged) {
      // free the final round's materialized blocks before failing —
      // nothing tracks them after the throw
      releaseCheckpoint(cur)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    }
    // At the fixpoint every edge is (member, component-min), already
    // materialized by the checkpoint; track it so Verify/Bench loops
    // release the blocks deterministically (CacheScope understands
    // LogicalRDD-backed checkpoints).
    graft.CacheScope.track(cur)
    val roots = cur.groupBy(col("u").as("id")).agg(min(col("v")).as("comp"))
    nodes.join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component"))
  }
}
