package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized text near-duplicate mining — the library form of the
  * `doc_ngram_jaccard` / `doc_minhash_lsh` / `doc_simhash` queries
  * (SURVEY §2c #37-39), for callers that need different shingle sizes,
  * signature widths, or banding than the oracle-pinned defaults.
  *
  * Shared scale shape: shingling is the codegen'd ShingleNGrams
  * expression (map-side); only fingerprint-sized rows (shingle strings,
  * k-wide signatures, band keys) ever shuffle — never document bodies;
  * candidate generation is always a posting-list or band-bucket equi
  * join, never cartesian.
  *
  * Inputs carry (doc_id, text); intermediate persists are registered
  * with graft.CacheScope — call CacheScope.releaseAll() after the
  * consuming action.
  */
object TextDedup {

  /** (doc_id, shingles): distinct word n-gram shingle array per doc.
    * The scan is spread first ([[Skew.spreadScan]] — no-op at
    * production scale): every miner downstream runs md5/signature
    * kernels per shingle, and an unsplittable input would otherwise
    * serialize all of it on one core. */
  def shingleArrays(docs: DataFrame, n: Int = 3): DataFrame =
    Skew.spreadScan(docs).select(col("doc_id"),
      graft.functions.ShingleNGrams.column(split(col("text"), " "), n)
        .as("shingles"))

  /** LSH band structs over a k-wide `sig` array column: one
    * struct(band_idx, band_hash) per band, band_hash = murmur3 over the
    * band's signature slice. Shared by the batch miner AND the
    * streaming dedup (streaming/DocStream.scala) — their stream/batch
    * verdict parity depends on this exact hash family, so there is
    * deliberately one definition. */
  def bandStructs(k: Int, bands: Int): Seq[Column] = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rowsPerBand = k / bands
    (0 until bands).map { b =>
      val cols = (rowsPerBand * b until rowsPerBand * (b + 1))
        .map(j => element_at(col("sig"), j + 1))
      struct(lit(b).as("band_idx"), hash(cols: _*).as("band_hash"))
    }
  }

  /** (doc → distinct shingle) posting rows — the join side of every
    * cross-corpus check. */
  def gramPostings(df: DataFrame, n: Int, out: String): DataFrame =
    shingleArrays(df, n)
      .select(col("doc_id").as(out), explode(col("shingles")).as("shingle"))

  /** Cross-corpus n-gram overlap — benchmark decontamination (the
    * GPT-3 appendix-C / Lee et al. 2022 §6.2 procedure): flag every
    * training doc sharing at least `minShared` distinct word n-grams
    * with any benchmark/eval doc, reporting the (train, bench,
    * n_shared) collision evidence. Same posting-list shape as
    * [[ngramJaccardPairs]], but cross-corpus and thresholded on the
    * ABSOLUTE collision count (decontamination cares about any leaked
    * span, not symmetric similarity).
    *
    * Scale: both sides shingle map-side (codegen) and drop text before
    * the shuffle; the join key is the shingle string so each bucket is
    * one gram's cross posting list. The bench side of a real pipeline
    * is tiny (eval suites, MBs) — AQE broadcasts it at runtime; the
    * 100 TB train side never self-joins. */
  def crossCorpusOverlap(train: DataFrame, bench: DataFrame,
      n: Int = 5, minShared: Long = 5L): DataFrame =
    gramPostings(train, n, "train_id")
      .join(gramPostings(bench, n, "bench_id"), "shingle")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** FUZZY cross-corpus decontamination — the paraphrased-contamination
    * case [[crossCorpusOverlap]]'s exact n-gram collisions can miss:
    * MinHash-ESTIMATED shingle Jaccard between training docs and
    * benchmark docs, banded LSH for candidates (a train doc pairs with
    * a bench doc iff some band agrees), verification against the
    * k-wide signature table only — posting lists never join.
    *
    * One signature/band build covers BOTH corpora (the caller supplies
    * predicates splitting the shared doc_id space — one shingle pass,
    * and the oracle replays a single chain); the band join is then
    * CROSS-corpus: train-side rows × bench-side rows, never a
    * self-join, so the 100 TB train side meets only the (tiny,
    * AQE-broadcast) bench side per bucket.
    *
    * `md5Hash = true` is the engine-portable family
    * ([[minhashMd5Pairs]]'s trade: ~3-10× per-shingle cost, DuckDB
    * hash-exact — requires power-of-two k so est = agree/k is an exact
    * binary fraction); false = seeded murmur3, the production hash
    * (rows-only, same estimator — the §8 trade). Output:
    * (doc_id, bench_id, est_jaccard). */
  def crossCorpusFuzzy(docs: DataFrame, isBench: Column, n: Int = 3,
      k: Int = 16, bands: Int = 4, tau: Double = 0.5,
      md5Hash: Boolean = false): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    if (md5Hash) require(k > 0 && (k & (k - 1)) == 0,
      s"k=$k must be a power of two for bit-exact agree/$k")
    val rpb = k / bands
    // ONE signature definition for the whole family: [[fuzzySigs]] is
    // the single place the per-permutation min-hash column is built
    // (batch and streaming sides cannot drift)
    val sigs = graft.CacheScope.persistTracked(
      fuzzySigs(docs, n, k, md5Hash).withColumn("bench", isBench))
    val bandRows = sigs.select(col("doc_id"), col("bench"),
      posexplode(array((0 until bands).map(b =>
        concat_ws("|", (rpb * b until rpb * (b + 1)).map(j => col(s"h$j")): _*)): _*))
        .as(Seq("band_idx", "band_key")))
    val cand = bandRows.filter(!col("bench")).as("a")
      .join(bandRows.filter(col("bench")).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("bench_id"))
      .distinct()
    val agree = (0 until k)
      .map(j => when(col(s"a.h$j") === col(s"b.h$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigs.as("a"), cand("doc_id") === col("a.doc_id"))
      .join(sigs.as("b"), cand("bench_id") === col("b.doc_id"))
      .select(cand("doc_id"), cand("bench_id"),
        (agree.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= tau)
  }

  /** MinHash signature table (doc_id, h0‥h_{k−1}) for
    * [[crossCorpusFuzzy]]'s two hash families — built once per corpus
    * side so the streaming sink can freeze the bench side. */
  def fuzzySigs(docs: DataFrame, n: Int = 3, k: Int = 16,
      md5Hash: Boolean = false): DataFrame = {
    def sigCol(j: Int): Column =
      if (md5Hash) min(md5(concat(lit(s"$j:"), col("shingle"))))
      else min(hash(lit(j), col("shingle")))
    shingleArrays(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .groupBy("doc_id")
      .agg(sigCol(0).as("h0"), (1 until k).map(j => sigCol(j).as(s"h$j")): _*)
  }

  /** [[crossCorpusFuzzy]] against a PREBUILT bench signature table —
    * the streaming form: the bench side is signed once ([[fuzzySigs]])
    * and frozen for the query lifetime; each arriving train batch
    * signs only itself. A train doc's signature depends on nothing
    * but its own shingles and a verdict on nothing but the frozen
    * bench table, so per-batch outputs union to the batch sweep —
    * parity by construction, pinned in DecontaminateSpec. */
  def crossCorpusFuzzyAgainst(train: DataFrame, benchSigs: DataFrame,
      n: Int = 3, k: Int = 16, bands: Int = 4, tau: Double = 0.5,
      md5Hash: Boolean = false): DataFrame =
    // the signature build is the expensive pass (shingle explode +
    // k-way min aggregate); it feeds BOTH the band join and the
    // verification join, so cache it for the CacheScope lifecycle
    // (Verify/Bench consume-then-release). Streaming callers with
    // their own per-batch lifecycle persist/unpersist around
    // [[crossCorpusFuzzySigsJoin]] instead (decontaminateFuzzySink).
    crossCorpusFuzzySigsJoin(
      graft.CacheScope.persistTracked(fuzzySigs(train, n, k, md5Hash)),
      benchSigs, k, bands, tau)

  /** The band-join + signature-verification core of the fuzzy
    * cross-corpus family, over two PREBUILT [[fuzzySigs]] tables.
    * Callers own the trainSigs lifecycle: it is referenced twice in
    * this plan (band join and verification join), so an uncached
    * trainSigs recomputes its shingle pass twice. */
  def crossCorpusFuzzySigsJoin(trainSigs: DataFrame, benchSigs: DataFrame,
      k: Int = 16, bands: Int = 4, tau: Double = 0.5): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rpb = k / bands
    def bandRows(sigs: DataFrame): DataFrame = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        concat_ws("|", (rpb * b until rpb * (b + 1)).map(j => col(s"h$j")): _*)): _*))
        .as(Seq("band_idx", "band_key")))
    val cand = bandRows(trainSigs).as("a")
      .join(bandRows(benchSigs).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("bench_id"))
      .distinct()
    val agree = (0 until k)
      .map(j => when(col(s"a.h$j") === col(s"b.h$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(trainSigs.as("a"), cand("doc_id") === col("a.doc_id"))
      .join(benchSigs.as("b"), cand("bench_id") === col("b.doc_id"))
      .select(cand("doc_id"), cand("bench_id"),
        (agree.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= tau)
  }

  /** Exact Jaccard near-dup pairs at threshold tau via PREFIX-FILTERED
    * posting-list self-join (AllPairs/PPJoin family): under a global
    * rarest-first total order on shingles (document frequency, then
    * shingle), J(a,b) >= tau implies |a∩b| >= ceil(tau*|a|), so the
    * SMALLEST shared shingle in that order must sit inside BOTH docs'
    * (|d| - ceil(tau*|d|) + 1)-prefixes — only prefix postings join,
    * and the prefix holds exactly the RAREST shingles, which is what
    * collapses the candidate count on dense corpora (a 31-word-vocab
    * 50k-doc corpus mines ~14x faster; sparse corpora are unchanged).
    * Size-incompatible pairs are additionally pruned AT THE JOIN
    * (jaccard >= tau forces |A| >= tau*|B| and |B| >= tau*|A|).
    * Candidates are then verified EXACTLY map-side via array_intersect
    * of the full shingle arrays — bit-identical output to the
    * unfiltered join, pinned by the DuckDB oracle.
    * Output: (doc_a, doc_b, inter, n_a, n_b, jaccard). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3,
      tau: Double = 0.5): DataFrame = {
    val arr = graft.CacheScope.persistTracked(shingleArrays(docs, n)
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("n_sh"))
      .filter(col("n_sh") > 0))
    val post = arr.select(col("doc_id"), col("n_sh"),
      explode(col("shingles")).as("shingle"))
    val dfreq = post.groupBy("shingle").agg(count(lit(1)).as("df"))
    // tiny slack everywhere tau meets doubles: tau * n_sh can round
    // ABOVE the exact rational bound (0.55 * 100 = 55.000000000000007),
    // which would shrink a prefix / drop a boundary pair; the slack
    // only ever ADMITS extra candidates, which the exact verify below
    // discards — zero effect on the result holds unconditionally
    val slack = 1e-9
    val ranked = post.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))))
      .filter(col("rk") <=
        col("n_sh") - ceil(col("n_sh") * tau - slack) + 1)
      .select("doc_id", "n_sh", "shingle")
    val cand = ranked.as("a")
      .join(ranked.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n_sh").cast("double") * tau <= col("b.n_sh") + slack &&
          col("b.n_sh").cast("double") * tau <= col("a.n_sh") + slack)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val jac = col("inter").cast("double") /
      (col("n_a") + col("n_b") - col("inter"))
    cand
      .join(arr.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"),
        col("n_sh").as("n_a")), "doc_a")
      .join(arr.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"),
        col("n_sh").as("n_b")), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("bigint"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")
  }

  /** The mined pair graph as a persisted ARTIFACT (parallel to
    * Similarity.ivfIndex): a production pipeline mines ONCE per
    * corpus, writes the (doc_a, doc_b, …, jaccard) rows — ids and
    * scores only, never documents, so the artifact is O(pairs) tiny —
    * and every downstream product (victim removal, clustering,
    * canonical selection) in every later SESSION reads it instead of
    * re-mining. QueryMemo gives the same mine-once semantic within
    * one session; the parquet artifact is what makes it hold across
    * sessions and across a cluster. Consumers opt in by setting
    * `graft.dedup.pairGraphPath` (see graft.queries.Docs.minedPairs);
    * PairGraphSpec pins the round trip and the prebuilt-graph
    * products to the mined ones. The mining parameters are stamped
    * into a `_graft_pair_graph.json` sidecar INSIDE the parquet dir
    * (underscore-prefixed, so scans ignore it; travels with the
    * artifact on any filesystem) — readers fail fast on a parameter
    * mismatch instead of silently feeding every downstream dedup
    * product pairs mined under a different n/tau (ADVICE r12). */
  def writePairGraph(pairs: DataFrame, path: String, n: Int = 3,
      tau: Double = 0.5): Unit = {
    pairs.write.mode("overwrite").parquet(path)
    val metaPath =
      new org.apache.hadoop.fs.Path(path, "_graft_pair_graph.json")
    val fs = metaPath.getFileSystem(
      pairs.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    try out.write(s"""{"kind": "jaccard_pair_graph", "n": $n, "tau": $tau}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a [[writePairGraph]] artifact, failing fast if the path does
    * not hold a pair graph (the two id columns are what every consumer
    * joins on) or was mined under different parameters than the
    * consumer expects (the sidecar check). */
  def readPairGraph(spark: org.apache.spark.sql.SparkSession,
      path: String, expectN: Int = 3, expectTau: Double = 0.5): DataFrame = {
    val g = spark.read.parquet(path)
    require(Seq("doc_a", "doc_b").forall(g.columns.contains),
      s"readPairGraph: $path is not a pair graph artifact " +
        s"(columns ${g.columns.mkString(", ")} lack doc_a/doc_b)")
    val metaPath = new org.apache.hadoop.fs.Path(path, "_graft_pair_graph.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"readPairGraph: $path carries no _graft_pair_graph.json sidecar " +
        "(pre-r13 artifact or not written by writePairGraph) - re-mine " +
        "with writePairGraph to stamp the mining parameters")
    val meta = {
      val in = fs.open(metaPath)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var read = in.read(chunk)
        while (read > 0) { buf.write(chunk, 0, read); read = in.read(chunk) }
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
    def field(k: String): Option[String] =
      (s""""$k"\\s*:\\s*([0-9.eE+-]+)""").r.findFirstMatchIn(meta).map(_.group(1))
    val (gotN, gotTau) = (field("n").map(_.toDouble), field("tau").map(_.toDouble))
    require(gotN.contains(expectN.toDouble) && gotTau.contains(expectTau),
      s"readPairGraph: $path mined with n=${gotN.orNull} tau=${gotTau.orNull}, " +
        s"consumer expects n=$expectN tau=$expectTau - refusing a " +
        "parameter-mismatched pair graph")
    g
  }

  /** MinHash+LSH pairs over the md5 hash family — the ORACLE-REPLAYABLE
    * sibling of [[minhashLshPairs]]: signature j is
    * min(md5(j || ':' || shingle)) under the LEXICOGRAPHIC order of hex
    * strings (a monotone bijection of a uniform 128-bit value, so the
    * MinHash estimator is unchanged), bands are '|'-joined signature
    * slices, candidates pair on band equality and similarity is the
    * signature-agreement estimator. ~10x the per-row hash cost of the
    * murmur3 production path — use it where a DuckDB replay must
    * reproduce every byte (the md5 correctness twins, the scale-safe
    * e2e pipeline). Same shuffle shape as the production path: only
    * (doc_id, k-wide signature) and band keys ever shuffle, never text.
    * Output: (doc_a, doc_b, est_jaccard), filtered at `tau`.
    *
    * '''Bit-identical replay requires `k` to be a power of two.''' The
    * similarity column is `agree / k`; when k is a power of two that is
    * an exact binary fraction, so DuckDB and Spark produce the same
    * double for every pair. For any other k (e.g. 12) the division
    * rounds, and replay holds only to 1-ulp float tolerance — the
    * function enforces power-of-two k so a parameterized caller cannot
    * silently weaken the guarantee this md5 family exists to provide.
    * (Need a non-power-of-two k? Use the murmur3 production path
    * [[minhashLshPairs]], whose verification is rows-only by design.) */
  def minhashMd5Pairs(docs: DataFrame, n: Int = 3, k: Int = 16,
      bands: Int = 4, tau: Double = 0.5): DataFrame = {
    require(k > 0 && (k & (k - 1)) == 0,
      s"k=$k must be a power of two: est_jaccard = agree/k is only " +
        "bit-identical across engines for exact binary fractions")
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rpb = k / bands
    val sh = graft.CacheScope.persistTracked(
      shingleArrays(docs, n)
        .select(col("doc_id"), explode(col("shingles")).as("shingle")))
    val sigCols = (0 until k).map(j =>
      min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"h$j"))
    val sigs = graft.CacheScope.persistTracked(
      sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*))
    val bandRows = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        concat_ws("|", (rpb * b until rpb * (b + 1)).map(j => col(s"h$j")): _*)): _*))
        .as(Seq("band_idx", "band_key")))
    val cand = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val agree = (0 until k)
      .map(j => when(col(s"a.h$j") === col(s"b.h$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigs.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sigs.as("b"), col("doc_b") === col("b.doc_id"))
      // when k is a power of two, agree/k is an exact binary fraction —
      // bit-identical across engines
      .select(col("doc_a"), col("doc_b"),
        (agree.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= tau)
  }

  /** MinHash signatures (k seeded murmur3 minima over the shingle
    * posting list) banded into `bands` buckets; candidates pair on any
    * shared band bucket and similarity is ESTIMATED from signature
    * agreement (the unbiased MinHash estimator) — verification touches
    * only the k-wide signature table, never posting lists. Output:
    * (doc_a, doc_b, est_jaccard). */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, k: Int = 16,
      bands: Int = 4, tau: Double = 0.5): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val sigCols = (0 until k).map(j => min(hash(lit(j), col("shingle"))).as(s"h$j"))
    val sigs = graft.CacheScope.persistTracked(
      shingleArrays(docs, n)
        .select(col("doc_id"), explode(col("shingles")).as("shingle"))
        .groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
        .withColumn("sig", array((0 until k).map(j => col(s"h$j")): _*))
        .select(col("doc_id"), col("sig")))
    val bandRows = sigs
      .select(col("doc_id"), explode(array(bandStructs(k, bands): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band_idx").as("band_idx"),
        col("bs.band_hash").as("band_hash"))
    val cand = bandRows.as("a")
      .join(bandRows.as("b"), Seq("band_idx", "band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // no broadcast hint: candidate cardinality is data-dependent
    // (quadratic in bucket skew) — AQE picks from runtime sizes.
    // Signature agreement is the codegen'd ArrayEqCount kernel; the
    // aggregate(zip_with(...)) formulation is interpreted and allocates
    // per candidate pair.
    val est = graft.functions.ArrayEqCount
      .column(col("sig_a"), col("sig_b")).cast("double") / k
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= tau)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** SimHash near-dup pairs: 64-bit signature per doc (codegen'd
    * SimHash64 over shingles), candidates pair on any equal
    * (64/bands)-bit band — pigeonhole guarantees every pair within
    * Hamming ≤ bands-1 shares a band — then verified with
    * bit_count(xor) ≤ maxHamming. Output: (doc_a, doc_b, hamming). */
  def simhashPairs(docs: DataFrame, n: Int = 3, bands: Int = 8,
      maxHamming: Int = 7): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    import graft.functions.GraftFunctions.simhash64
    val sigs = shingleArrays(docs, n)
      .select(col("doc_id"), simhash64(col("shingles")).as("sig"))
    val bandRows = graft.CacheScope.persistTracked(
      sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band_idx"))
      .withColumn("band",
        expr(s"shiftrightunsigned(sig, band_idx * $width)")
          .bitwiseAND(lit(mask))))
    bandRows.as("a")
      .join(bandRows.as("b"), Seq("band_idx", "band"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
      .distinct()
  }
}
