package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine byte-pair-encoding tokenizer (Sennrich et al. 2016 — the
  * subword family every modern LLM tokenizer descends from), built the
  * lmTrain/ivfIndex way: TRAIN a merge table from the corpus as a
  * persistable artifact, then ENCODE any corpus/stream against the
  * frozen table with a codegen'd map-side kernel
  * ([[graft.functions.BpeApplyMerges]]).
  *
  * Why this matters here: token counts drive `doc_pack` sequence
  * budgets and `doc_mixture` per-token weighting — the two curation
  * operators most sensitive to tokenizer fidelity — and the repo's
  * row-45 "BPE-ish regex" was an admitted approximation (VERDICT r15
  * item 1). This is the real learned loop, end to end in the engine.
  *
  * Scale shape (100 TB): training runs on the WORD-FREQUENCY table,
  * never the corpus — ONE corpus pass builds (word, n) (partial-agg
  * shuffle on the word string), and every merge round then iterates
  * over the vocabulary-sized working set: pair counting is one
  * partial-agg groupBy over the table's adjacent symbol pairs
  * (weighted by n), the argmax is a 1-row TakeOrdered, and the merge
  * applies map-side via the kernel with the winning rule broadcast.
  * Web-scale vocabularies are tens of millions of rows — cluster
  * change, not corpus change, per round. Encoding at scale goes
  * through the same dictionary: encode DISTINCT words once, join
  * instances back (AQE picks broadcast vs shuffle from the dictionary
  * size), so the per-document cost is a join, not a re-derivation.
  *
  * Cross-engine exactness: counts are exact longs, the tie-break is
  * (count DESC, pair-string ASC) — no floats anywhere in training or
  * encoding, so the DuckDB oracle replays every byte (the generated
  * unrolled-merge CTE chain in graft.queries.Tokenize). */
object BpeTokenizer {

  /** The learned tokenizer artifact: `merges` = (rank, lhs, rhs, cnt)
    * in application order, `meta` = one stamped row (num_merges).
    * Plain DataFrames — write to parquet, read back, encode. */
  final case class BpeModel(merges: DataFrame, meta: DataFrame)

  /** Character segmentation of a `word` column — the base alphabet.
    * substring(word, i, 1) in both engines (code-point semantics),
    * NOT split(word, ""), whose edge behavior is engine-specific. */
  private def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1)))

  // functions.substring takes literal pos — the SQL form accepts a column
  private def substring(str: Column, pos: Column, len: Column): Column =
    call_function("substring", str, pos, len)

  /** The (word, n) frequency table of a (doc_id, text) frame — the
    * vocabulary-sized working set everything else iterates on. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` BPE merge rules from the corpus. Each round:
    * count adjacent symbol pairs over the vocabulary table (weighted
    * by word frequency, via the multiplicity-preserving NGramInstances
    * kernel), pick the most frequent pair (ties toward the
    * lexicographically smallest pair string — deterministic,
    * engine-replayable), and apply it map-side. A round whose pair
    * table is empty (fully merged vocabulary) records nothing and
    * leaves the table unchanged — the dummy guard row below never
    * matches a real symbol. */
  def train(docs: DataFrame, numMerges: Int): BpeModel = {
    require(numMerges >= 1, s"train: numMerges=$numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // each round is cut with a LAZY localCheckpoint materialized by
    // count() — the ConnectedComponents discipline: round r's plan
    // references words(r-1) TWICE (through the argmax and through the
    // merge application), so without truncation the logical plan
    // doubles per round and Catalyst analysis goes exponential (a
    // 16-round train never left the analyzer). The checkpoint pins
    // every round at a constant-size leaf; CacheScope.releaseAll frees
    // the blocks after the consuming action (the repo-wide
    // consume-then-release contract).
    var words = wordCounts(docs).withColumn("syms", charSyms(col("word")))
      .localCheckpoint(eager = false)
    graft.CacheScope.track(words)
    words.count()
    var merges: DataFrame = null
    for (rank <- 1 to numMerges) {
      val pairs = words.select(col("n"),
          explode(graft.functions.NGramInstances.column(col("syms"), 2))
            .as("pair"))
        .groupBy("pair").agg(sum("n").as("cnt"))
      // the dummy row keeps the round total when the vocabulary is
      // fully merged: pair " " splits to (lhs="", rhs=""), which the
      // kernel never matches, and cnt=-1 loses to any real pair
      val best = graft.CacheScope.persistTracked(pairs
        .unionByName(Seq((" ", -1L)).toDF("pair", "cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1)
        .select(lit(rank).as("rank"),
          element_at(split(col("pair"), " ", 2), 1).as("lhs"),
          element_at(split(col("pair"), " ", 2), 2).as("rhs"),
          col("cnt")))
      merges = if (merges == null) best else merges.unionByName(best)
      words = words.crossJoin(broadcast(best.select(
          array(struct(col("lhs"), col("rhs"))).as("ms"))))
        .withColumn("syms",
          graft.functions.BpeApplyMerges.column(col("syms"), col("ms")))
        .select("word", "n", "syms")
        .localCheckpoint(eager = false)
      graft.CacheScope.track(words)
      words.count()
    }
    val meta = Seq(numMerges).toDF("num_merges")
    BpeModel(merges.filter(col("cnt") > 0), meta)
  }

  /** The frozen merge table folded into ONE broadcast array row in
    * rank order — the kmeans centArr pattern: encoding is then pure
    * map-side kernel work, no collect anywhere. */
  private def mergesArr(model: BpeModel): DataFrame =
    broadcast(model.merges.agg(
      transform(
        array_sort(collect_list(struct(col("rank"), col("lhs"), col("rhs")))),
        t => struct(t.getField("lhs").as("lhs"), t.getField("rhs").as("rhs")))
        .as("ms")))

  /** Encode the distinct words of a frame carrying a `word` column:
    * appends `syms` (the subword segmentation) and `n_sub` (= the
    * BPE token count of one occurrence). This is the DICTIONARY path —
    * call it on distinct words and join instances back. */
  def encodeWords(words: DataFrame, model: BpeModel): DataFrame =
    words.crossJoin(mergesArr(model))
      .withColumn("syms",
        graft.functions.BpeApplyMerges.column(charSyms(col("word")), col("ms")))
      .withColumn("n_sub", size(col("syms")))
      .drop("ms")

  /** Per-document BPE token counts of a (doc_id, text, …) frame
    * against a frozen model: encode the distinct words once, join the
    * instance stream back (no broadcast hint — the dictionary is
    * corpus-vocabulary-sized, AQE decides), sum per doc. Returns
    * (doc_id, n_words, n_bpe_tokens). Documents with no words (empty
    * text) are absent — the lmScore/scoreWithLm contract. */
  def encodeCounts(docs: DataFrame, model: BpeModel): DataFrame = {
    val inst = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val dict = encodeWords(inst.select("word").distinct(), model)
      .select("word", "n_sub")
    inst.join(dict, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_sub").as("n_bpe_tokens"))
  }

  /** Persist / reload a [[BpeModel]] (parquet artifact, stamped meta —
    * the loadPqIndex fail-fast convention: a merge table whose ranks
    * disagree with the stamp refuses to load). */
  def save(model: BpeModel, dir: String): Unit = {
    model.merges.write.mode("overwrite").parquet(s"$dir/merges")
    model.meta.write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: SparkSession, dir: String): BpeModel = {
    val meta = spark.read.parquet(s"$dir/meta")
    val row = meta.select("num_merges").collect()
    require(row.length == 1, s"load: malformed meta at $dir/meta")
    val nm = row(0).getInt(0)
    val merges = spark.read.parquet(s"$dir/merges")
    val mx = merges.agg(max(col("rank")), count(lit(1))).collect()(0)
    require(mx.isNullAt(0) || (mx.getInt(0) <= nm && mx.getLong(1) <= nm),
      s"load: $dir merges carry rank ${mx.get(0)} / ${mx.get(1)} rules, " +
        s"stamped num_merges=$nm — refusing a mixed artifact")
    BpeModel(merges, meta)
  }
}
