package graft

import org.apache.spark.sql.SparkSession

/** Declarative per-query scale classes (VERDICT r12 item 2).
  *
  * Two query families are DOCUMENTED walls above the small-SF corpora
  * they exist for, with committed evidence in CORRECTNESS_sf3.json /
  * BASELINE.md. Until round 12 the scale gates hand-excluded them via
  * SPARK_GRAFT_ONLY lists; this object makes the classification part
  * of the library surface so Bench/Verify/check.py agree on it without
  * a manual list, and the exclusions appear declared in the gate
  * artifacts instead of being silently absent.
  *
  * Classes:
  *   - `demo`: the pinned config itself stops being runnable above the
  *     demo corpus — the SPARK side hits the wall. Excluded from runs
  *     above the threshold (still runnable by naming it explicitly).
  *   - `oracleQuadratic`: the Spark side scales (all were green at sf3
  *     where attempted) but the single-node DuckDB ORACLE re-mines the
  *     pair graph quadratically and hits RAM/disk walls at sf3.
  *     Above the threshold these still run and dump results; the
  *     checker downgrades them to a rows-only record with the skip
  *     reason declared.
  */
object ScaleClasses {

  /** Small-corpus pins whose Spark-side plan is documented failing
    * above the demo corpus (name -> why). */
  val demo: Map[String, String] = Map(
    "emb_neardup" ->
      ("8x4 demo banding: ~N^2/16 candidates per band need >200GB " +
        "transient spill at 60k vectors (CORRECTNESS_sf3); the " +
        "production banding is emb_neardup_scale"),
    "emb_neardup_exact" ->
      ("quadratic-by-design exact recall baseline (bounded BNLJ); " +
        "3.6G-pair join at 60k vectors"))

  /** Queries whose DuckDB oracle is a quadratic single-node replay
    * (unfiltered all-pairs shingle mining / 64-bit hamming band join)
    * with sf3 walls on record: doc_dedup_canon OOM at 100GB,
    * doc_simhash_md5 spill-disk-full (CORRECTNESS_sf3.json). The
    * others share the same mining CTE shape. */
  val oracleQuadratic: Set[String] = Set(
    "doc_ngram_jaccard", "doc_dedup_near", "doc_dedup_clusters",
    "doc_dedup_canon", "doc_dup_spans", "doc_simhash_md5")

  /** Second exclusion tier (VERDICT r13 item 1): queries embedding the
    * EXACT all-pairs Jaccard miner, whose SPARK side is documented
    * walling one decade above the demo tier — at sf10's 500k docs drawn
    * from the generator's 31-word vocabulary the true pair graph itself
    * is quadratic (every doc shares shingles with essentially every
    * other; prefix filtering cannot prune a corpus where every pair is
    * a true candidate) and the mining shuffle exceeded the host's
    * ~77 GB free spill (BASELINE.md sf10 section). One decade below
    * (sf3, 150k docs) every member is real, attempted coverage — so
    * these get their own threshold instead of the demo tier's.
    * The e2e composition's scale path is `doc_pipeline_scale`, which
    * swaps the mining stage for MinHash/LSH banding (md5 family). */
  val minerScale: Map[String, String] = {
    val why = "exact all-pairs Jaccard miner: quadratic true pair " +
      "graph at the scale corpus's adversarial 31-word-vocabulary " +
      "density; mining shuffle exceeds host spill at 500k docs " +
      "(BASELINE.md sf10)"
    Map(
      "doc_pipeline_e2e" ->
        (why + "; the scale path is doc_pipeline_scale (MinHash/LSH stage)"),
      "doc_ngram_jaccard" -> why,
      "doc_dedup_near" -> why,
      "doc_dedup_clusters" -> why,
      "doc_dedup_canon" -> why,
      "doc_dup_spans" -> why)
  }

  /** Corpus threshold: every class member is oracle-green through sf1
    * (50k docs / 20k embeddings, CORRECTNESS_sf1.json) and the
    * documented walls appear at sf3 (150k docs / 60k embeddings) —
    * the boundary sits between those decades. */
  val maxDemoDocs: Long = 100000L
  val maxDemoEmbeddings: Long = 40000L

  /** Miner-tier threshold: every [[minerScale]] member is oracle- or
    * rows-green through sf3 (150k docs) and the documented Spark-side
    * wall appears at sf10 (500k docs) — boundary between those. */
  val maxMinerDocs: Long = 200000L

  private def rows(spark: SparkSession, sfDir: String, t: String): Long = {
    val p = new java.io.File(s"$sfDir/$t.parquet")
    if (!p.exists()) 0L else spark.read.parquet(p.getPath).count()
  }

  /** True when the corpus at `sfDir` is past the demo decade. Row
    * counts come from parquet metadata (column-less count) — cheap
    * even at sf3, and runs once per Bench/Verify session outside any
    * timed region. */
  def aboveThreshold(spark: SparkSession, sfDir: String): Boolean =
    rows(spark, sfDir, "documents") > maxDemoDocs ||
      rows(spark, sfDir, "embeddings") > maxDemoEmbeddings

  /** Effective Spark-side auto-exclusions for the corpus at `sfDir`:
    * the demo tier past the demo decade, plus the exact-miner tier
    * past ITS decade. One map so Bench/Verify/check.py share a single
    * exclusion mechanism regardless of tier. */
  def exclusions(spark: SparkSession, sfDir: String): Map[String, String] = {
    val docs = rows(spark, sfDir, "documents")
    val embs = rows(spark, sfDir, "embeddings")
    val t1 = if (docs > maxDemoDocs || embs > maxDemoEmbeddings) demo
             else Map.empty[String, String]
    val t2 = if (docs > maxMinerDocs) minerScale
             else Map.empty[String, String]
    t1 ++ t2
  }

  /** JSON fragment declaring the classification, embedded in Verify's
    * outDir (scale_classes.json) and Bench's record so every scale
    * artifact carries its own exclusion list. The `demo` key carries
    * the EFFECTIVE exclusion map (whatever tiers the corpus crossed) —
    * check.py keys its declared-skip records off it; the tier
    * membership/threshold keys document which tier each name came
    * from. */
  def declarationJson(above: Boolean,
      excluded: Map[String, String]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def m(kv: Map[String, String]) = kv.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val quadJson = oracleQuadratic.toSeq.sorted.map(q).mkString("[", ",", "]")
    val minerJson = minerScale.keys.toSeq.sorted.map(q).mkString("[", ",", "]")
    s"""{"above_threshold": $above, "demo": ${m(excluded)}, "oracle_quadratic": $quadJson, "miner_scale": $minerJson, "max_demo_docs": $maxDemoDocs, "max_demo_embeddings": $maxDemoEmbeddings, "max_miner_docs": $maxMinerDocs}"""
  }
}
