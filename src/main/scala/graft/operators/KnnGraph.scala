package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted kNN graph — the build-once artifact of the graph family
  * (r19). The `knndedup` scale probe shows the GRAPH BUILD is ~94% of
  * the end-to-end dedup wall (1,580 s of 1,681 s at 200k vectors), and
  * the build's product is just n·k (query_id, neighbor_id, rnk, qcos)
  * rows — exactly the thing you compute once, stamp, and reload for
  * every downstream consumer ([[GraphDedup.knnGraphDedup]],
  * [[GraphDedup.diversityPrototypes]], kNN-join analytics), the
  * [[Similarity.saveIvfPqIndex]] lifecycle applied to the graph.
  *
  * Incremental maintenance (the graph sibling of
  * [[graft.streaming.EmbStream.ivfPqAppendSink]]): arriving vectors
  * are searched against the frozen ANN index — their top-k rows are
  * their own forward adjacency AND the reverse-candidate offers that
  * existing nodes merge-and-truncate into their lists. This is the
  * local-join update rule of NN-Descent (Dong et al., WWW 2011:
  * "a neighbor of a neighbor is likely a neighbor" — new edges enter
  * through the arrival's own candidate list), bounded per batch at
  * k rows per arrival per direction, so a 100 TB graph absorbs a
  * stream at per-batch cost proportional to the batch.
  *
  * Approximation contract, stated precisely: an existing node u gains
  * arrival v iff u appears in v's top-k list. At the exact endpoint
  * scores are symmetric, so this misses v only when v ranks u below
  * its own k-th neighbor while u would rank v above u's k-th — the
  * asymmetric-neighborhood case (dense region around v, sparse around
  * u). KnnGraphSpec pins append ≡ full rebuild when the reverse
  * fan-out covers the fixture, and measures the documented gap on an
  * adversarial one; `n_appended` staleness meta + [[needsRebuild]]
  * bound how long the approximation is allowed to drift before a full
  * rebuild, exactly like [[Similarity.needsRefit]] for the index.
  */
object KnnGraph {

  /** A loaded graph: `edges` is the adjacency list ((query_id,
    * neighbor_id, rnk, qcos), rnk dense 1..k per query), `meta` one
    * stamped row (k, nprobe, n_nodes, n_edges, n_appended). */
  final case class KnnGraphArtifact(k: Int, nprobe: Int,
      edges: DataFrame, meta: DataFrame)

  private val EdgeCols = Seq("query_id", "neighbor_id", "rnk", "qcos")

  private def checkEdgeCols(where: String, edges: DataFrame): Unit = {
    val have = edges.columns.toSet
    require(EdgeCols.forall(have),
      s"$where: edge frame must carry ${EdgeCols.mkString(", ")}; " +
        s"got ${edges.columns.mkString(", ")}")
  }

  /** Persist a kNN graph (parquet artifact, stamped meta — the
    * [[Similarity.saveIvfPqIndex]] fail-fast convention). `edges` is
    * any [[Similarity.ivfPqKnnJoin]]-shaped frame; `k`/`nprobe` stamp
    * the build parameters so a loader can reject a graph built with a
    * different budget than the consumer assumes. */
  def save(edges: DataFrame, k: Int, nprobe: Int, dir: String): Unit = {
    checkEdgeCols("KnnGraph.save", edges)
    val e = edges.select(EdgeCols.map(col): _*)
    e.write.mode("overwrite").parquet(s"$dir/edges")
    e.sparkSession.read.parquet(s"$dir/edges")
      .agg(countDistinct(col("query_id")).as("n_nodes"),
        count(lit(1)).as("n_edges"))
      .select(lit(k).as("k"), lit(nprobe).as("nprobe"),
        col("n_nodes"), col("n_edges"), lit(0L).as("n_appended"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: SparkSession, dir: String): KnnGraphArtifact = {
    val meta = spark.read.parquet(s"$dir/meta")
    val row = meta.select("k", "nprobe").collect()
    require(row.length == 1, s"KnnGraph.load: malformed meta at $dir/meta")
    val edges = spark.read.parquet(s"$dir/edges")
    checkEdgeCols("KnnGraph.load", edges)
    KnnGraphArtifact(row(0).getInt(0), row(0).getInt(1), edges, meta)
  }

  /** Merge-and-truncate update core: fold the arrivals' forward
    * top-k lists into an existing adjacency. `forward` rows are the
    * arrivals' search output over the UPDATED index (base + arrival
    * codes, so arrival-arrival edges exist); each forward row is also
    * reversed into an offer to its neighbor (NN-Descent local join —
    * at the exact endpoint the reversed score is the true score of
    * the other direction; under ADC it is the v-side approximation,
    * documented). Every node keeps the top-k of (own rows ∪ offers)
    * by (qcos DESC, neighbor_id ASC) — the [[Similarity.ivfPqSearch]]
    * ranking — with ranks reassigned dense.
    *
    * Scale shape: the union is |base| + 2·|forward| id+double rows;
    * the dedup-and-rank shuffles once on query_id, and every key
    * carries at most k + (offers to that node) rows — bounded,
    * id-keyed, never touching vectors. */
  def mergeEdges(base: DataFrame, forward: DataFrame,
      k: Int): DataFrame = {
    checkEdgeCols("KnnGraph.mergeEdges", base)
    // forward frames need no rnk (ranks are reassigned below), but a
    // malformed hand-built delta should hit THIS message, not an
    // opaque analysis exception from the union (ADVICE r19)
    val fwdHave = forward.columns.toSet
    require(Seq("query_id", "neighbor_id", "qcos").forall(fwdHave),
      "KnnGraph.mergeEdges: forward frame must carry query_id, " +
        s"neighbor_id, qcos; got ${forward.columns.mkString(", ")}")
    val slim = (df: DataFrame) =>
      df.select(col("query_id"), col("neighbor_id"), col("qcos"))
    val rev = forward.select(col("neighbor_id").as("query_id"),
      col("query_id").as("neighbor_id"), col("qcos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    slim(base).unionByName(slim(forward)).unionByName(rev)
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(max(col("qcos")).as("qcos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        col("qcos"))
  }

  /** Batch append: search the arrivals against `index` (callers fold
    * arrival codes in first — [[Similarity.ivfPqAppend]] or
    * [[Similarity.loadIvfPqIndexWithDeltas]] — so arrival-arrival
    * edges are seen) and write ONLY the forward rows as an idempotent
    * `batch_id=N` delta subtree; the base artifact is never
    * rewritten. `newVecs` carries (vec_id, e: array<double>).
    *
    * Each delta row is stamped with the k/nprobe it was searched at
    * (ADVICE r19): [[save]]'s whole point is that a loader can reject
    * a graph built with a different budget, and an unstamped delta
    * would smuggle a different budget past that check. Constant
    * columns, not a per-subtree meta file — they dictionary-encode to
    * nothing in parquet and survive any subtree listing order. */
  def appendDelta(index: Similarity.IvfPqIndex, newVecs: DataFrame,
      k: Int, nprobe: Int, deltaDir: String, batchId: Long): Unit = {
    forwardEdges(index, newVecs, k, nprobe)
      .withColumn("k", lit(k)).withColumn("nprobe", lit(nprobe))
      .write.mode("overwrite").parquet(s"$deltaDir/batch_id=$batchId")
  }

  /** The arrivals' forward top-k lists (the delta payload):
    * [[Similarity.ivfPqSearch]] with the arrivals broadcast as the
    * query side — per-batch cost scales with the batch, not the
    * corpus. excludeSelf stays true: arrivals live in the corpus id
    * space (they were just encoded into it). */
  def forwardEdges(index: Similarity.IvfPqIndex, newVecs: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val dot = graft.functions.DotProduct.column _
    val q = newVecs.select(col("vec_id").as("query_id"),
        col("e").as("qe"))
      .withColumn("qnorm", sqrt(dot(col("qe"), col("qe"))))
    Similarity.ivfPqSearch(index, q, k, nprobe, excludeSelf = true)
      .select(EdgeCols.map(col): _*)
  }

  /** [[load]] + fold-in of append deltas: reads every `batch_id=N`
    * forward-edge subtree under `deltaDir` (written by [[appendDelta]]
    * or [[graft.streaming.EmbStream.knnGraphAppendSink]]), applies
    * the [[mergeEdges]] merge-and-truncate, and bumps `n_appended` by
    * the count of distinct arrival nodes (lazily — the counter rides
    * the plan, the [[Similarity.loadIvfPqIndexWithDeltas]]
    * discipline). A missing/empty deltaDir loads the base unchanged. */
  def loadWithDeltas(spark: SparkSession, dir: String,
      deltaDir: String): KnnGraphArtifact = {
    val base = load(spark, dir)
    val path = new org.apache.hadoop.fs.Path(deltaDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasDataFile(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { st =>
        val name = st.getPath.getName
        if (st.isDirectory) !name.startsWith("_") && !name.startsWith(".") &&
          hasDataFile(st.getPath)
        else !name.startsWith("_") && !name.startsWith(".")
      }
    val hasDeltas = fs.exists(path) &&
      fs.listStatus(path).exists { st =>
        st.isDirectory && st.getPath.getName.startsWith("batch_id=") &&
          hasDataFile(st.getPath)
      }
    if (!hasDeltas) base
    else {
      val deltas = spark.read.parquet(deltaDir)
      checkEdgeCols("KnnGraph.loadWithDeltas", deltas)
      // reject deltas searched at a different budget than the base
      // graph's stamp (ADVICE r19) — one tiny agg over the stamp
      // columns, which parquet serves from dictionary pages
      val dHave = deltas.columns.toSet
      require(dHave("k") && dHave("nprobe"),
        s"KnnGraph.loadWithDeltas: deltas at $deltaDir carry no " +
          "k/nprobe stamp (pre-r20 or hand-built) — re-append via " +
          "KnnGraph.appendDelta, which stamps the search budget")
      val budgets = deltas.select("k", "nprobe").distinct().collect()
      budgets.foreach { r =>
        require(r.getInt(0) == base.k && r.getInt(1) == base.nprobe,
          s"KnnGraph.loadWithDeltas: delta searched at k=${r.getInt(0)}" +
            s"/nprobe=${r.getInt(1)} but base graph is stamped " +
            s"k=${base.k}/nprobe=${base.nprobe}")
      }
      val forward = deltas.select(EdgeCols.map(col): _*)
      val meta = base.meta
        .crossJoin(forward.agg(
          countDistinct(col("query_id")).as("_arrivals")))
        .withColumn("n_appended", col("n_appended") + col("_arrivals"))
        .drop("_arrivals")
      KnnGraphArtifact(base.k, base.nprobe,
        mergeEdges(base.edges, forward, base.k), meta)
    }
  }

  /** Rebuild policy — the graph twin of [[Similarity.needsRefit]]:
    * true when appended nodes exceed `maxAppendFraction` of the nodes
    * the graph was BUILT over. Answers from the 1-row meta alone
    * (n_nodes stamped at save, n_appended by the delta fold); a graph
    * with no appends never needs a rebuild by this policy. Like
    * needsRefit, this is staleness ACCOUNTING — it bounds how much of
    * the adjacency went through the bounded NN-Descent update instead
    * of a full build — not a measured recall cliff. */
  def needsRebuild(g: KnnGraphArtifact,
      maxAppendFraction: Double = 0.5): Boolean = {
    val row = g.meta.select("n_nodes", "n_appended").collect()
    require(row.length == 1, "needsRebuild: malformed meta")
    StalenessPolicy.exceeded(row(0).getLong(0), row(0).getLong(1),
      maxAppendFraction)
  }
}
