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
    Skew.spreadScan(docs)
      .select(explode(split(col("text"), " ")).as("word"))
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

  /** The ONE-AGGREGATE trainer (r21): the merge loop expressed as a
    * single distributed aggregation over the (word, n) table —
    * [[graft.functions.BpeTrainMerges]] accumulates per-partition
    * vocabulary count maps (exact additive longs), merges them, and
    * runs [[BpeLocal.mergeLoop]] once on the reduced table. Replaces
    * 2·numMerges shuffle rounds + per-round checkpoints with ONE
    * corpus pass and ONE reduce, with no driver collect (the
    * trainLocal scale split, executor-side). Byte-identical merge
    * table to [[train]] (BpeSpec pins it); the aggregation buffer is
    * vocabulary-sized — the same state trainLocal collects. */
  def trainAgg(docs: DataFrame, numMerges: Int): BpeModel = {
    require(numMerges >= 1, s"trainAgg: numMerges=$numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = wordCounts(docs)
      .agg(graft.functions.BpeTrainMerges
        .column(col("word"), col("n"), numMerges).as("ms"))
      .select(explode(col("ms")).as("m"))
      .select(col("m.rank").as("rank"), col("m.lhs").as("lhs"),
        col("m.rhs").as("rhs"), col("m.cnt").as("cnt"))
    BpeModel(merges, Seq(numMerges).toDF("num_merges"))
  }

  /** The production many-merges trainer (SURVEY §8 / VERDICT r16 LLM
    * section): real tokenizers run 30k+ merges, and [[train]]'s
    * one-Spark-job-per-round loop — correct and oracle-replayable at
    * demo round counts — would spend hours on pure job scheduling at
    * that scale. The scale-right split this implements: the (word, n)
    * frequency table is VOCABULARY-sized at any corpus (the 100 TB
    * corpus changes the counts, not the table's cardinality), so ONE
    * distributed pass builds it and the entire merge loop then runs
    * driver-local over the collected table with the classic
    * incremental algorithm (Sennrich et al. 2016's learn_bpe shape):
    * a pair-count map + a lazy-deletion max-heap + a pair→words index,
    * so each round costs O(words containing the winning pair), not
    * O(vocabulary). 30k merges over a million-word vocabulary is
    * seconds, not hours ("bpe" ScaleProbe entry in PROBES.json).
    *
    * Exactness: byte-for-byte the same merge table as [[train]] on the
    * same vocabulary — same greedy fold, same exact long counts, same
    * (cnt DESC, pair-string ASC) tie-break compared on UTF-8 BYTES
    * (Java String.compareTo orders UTF-16 code units, which disagrees
    * with Spark/DuckDB binary collation for supplementary characters —
    * BpeSpec pins the parity, including a surrogate-pair
    * fixture). The collect is the loadPqIndex-class exception to the
    * no-driver-collect rule: vocabulary-sized artifact state, bounded
    * by `maxVocab` (top-`maxVocab` words by (n DESC, word ASC) — the
    * standard frequency-floor truncation; pass Int.MaxValue for exact
    * parity with the distributed loop). */
  def trainLocal(docs: DataFrame, numMerges: Int,
      maxVocab: Int = 1 << 20): BpeModel =
    trainFromCounts(wordCounts(docs), numMerges, maxVocab)

  /** Exact additive merge of two (word, n) frequency tables — the
    * tokenizer's incremental-maintenance state (the LmCounts pattern:
    * longs, associative and commutative, any increment order). BPE
    * merge RULES are not incrementally maintainable — Sennrich's
    * greedy argmax is globally count-dependent, so one new count can
    * reorder an early merge — but the rules derive from this
    * vocabulary-sized table in milliseconds ([[BpeLocal.mergeLoop]]),
    * so the scale split is: absorb text into counts distributed and
    * exactly (old text never re-read), re-derive the merge table
    * locally and cheaply ([[trainFromCounts]]). BpeSpec pins
    * trainFromCounts(mergeWordCounts(wc(A), wc(B))) ≡ trainLocal(A∪B)
    * and the prefix-stability pin covers the common case where the
    * absorbed increment leaves an already-shipped table's early rows
    * unchanged. */
  def mergeWordCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("word").agg(sum("n").as("n"))

  /** Derive the merge table from a (word, n) frequency table — the
    * vocabulary pass of [[trainLocal]] factored out so merged
    * incremental counts ([[mergeWordCounts]]) train without touching
    * any corpus. */
  def trainFromCounts(wc: DataFrame, numMerges: Int,
      maxVocab: Int = 1 << 20): BpeModel = {
    require(numMerges >= 1, s"trainFromCounts: numMerges=$numMerges must be >= 1")
    require(maxVocab >= 1, s"trainFromCounts: maxVocab=$maxVocab must be >= 1")
    val spark = wc.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = {
      val takeAll = maxVocab == Int.MaxValue
      val bounded =
        if (takeAll) wc
        else wc.orderBy(col("n").desc, col("word").asc).limit(maxVocab)
      bounded.select("word", "n").as[(String, Long)].collect()
    }
    val merges = BpeLocal.mergeLoop(vocab, numMerges)
    BpeModel(
      merges.toSeq.toDF("rank", "lhs", "rhs", "cnt"),
      Seq(numMerges).toDF("num_merges"))
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

  /** The driver-local incremental merge loop behind [[trainLocal]] —
    * pure Scala over the collected (word, n) table, no Spark inside.
    * Private to graft so BpeSpec and ScaleProbe can drive it
    * directly. */
  private[graft] object BpeLocal {
    import scala.collection.mutable

    /** Unsigned byte-wise UTF-8 comparison — the collation Spark's
      * UTF8String and DuckDB's binary ORDER BY both use. Java
      * String.compareTo orders UTF-16 code units instead and flips
      * supplementary characters below [U+E000, U+FFFF]. */
    def utf8Compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }

    /** Code-point segmentation — the same alphabet charSyms yields
      * (Spark substring / DuckDB substr count code points, so a
      * surrogate pair is ONE symbol). */
    def codePointSyms(w: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + cc)
        i += cc
      }
      out.toArray
    }

    /** One greedy left-to-right pass of a single rule — the
      * BpeApplyMerges.compute semantics, returned unchanged (same
      * array) when the rule never fires so callers can cheap-check. */
    private def applyRule(s: Array[String], lhs: String, rhs: String): Array[String] = {
      val out = new Array[String](s.length)
      var n = 0
      var i = 0
      while (i < s.length) {
        val x = s(i)
        if (n > 0 && out(n - 1) == lhs && x == rhs) out(n - 1) = lhs + rhs
        else { out(n) = x; n += 1 }
        i += 1
      }
      if (n == s.length) s else java.util.Arrays.copyOf(out, n)
    }

    /** The incremental loop: pair-count map + pair→words index +
      * lazy-deletion max-heap, so round r costs O(words containing the
      * winning pair) — merge-table-exact vs the distributed round loop
      * ((cnt DESC, pair-bytes ASC) argmax per round, greedy fold). */
    def mergeLoop(vocab: Array[(String, Long)],
        numMerges: Int): Array[(Int, String, String, Long)] = {
      val words: Array[Array[String]] = vocab.map(v => codePointSyms(v._1))
      val weight: Array[Long] = vocab.map(_._2)
      val pairCnt = mutable.HashMap.empty[String, Long]
      val pairWords = mutable.HashMap.empty[String, mutable.BitSet]
      // max-heap on (cnt, pair): bigger cnt wins, then byte-smaller pair
      val heap = mutable.PriorityQueue.empty[(Long, String)](
        new Ordering[(Long, String)] {
          def compare(a: (Long, String), b: (Long, String)): Int =
            if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
            else utf8Compare(b._2, a._2)
        })
      def bump(k: String, d: Long, touched: mutable.HashSet[String]): Unit = {
        val c = pairCnt.getOrElse(k, 0L) + d
        if (c == 0L) pairCnt.remove(k) else pairCnt.update(k, c)
        touched += k
      }
      def addPairs(wi: Int, touched: mutable.HashSet[String]): Unit = {
        val s = words(wi)
        var j = 0
        while (j < s.length - 1) {
          val k = s(j) + " " + s(j + 1)
          bump(k, weight(wi), touched)
          pairWords.getOrElseUpdate(k, mutable.BitSet.empty) += wi
          j += 1
        }
      }
      def subPairs(wi: Int, touched: mutable.HashSet[String]): Unit = {
        val s = words(wi)
        var j = 0
        while (j < s.length - 1) {
          bump(s(j) + " " + s(j + 1), -weight(wi), touched)
          j += 1
        }
      }
      val init = mutable.HashSet.empty[String]
      var wi = 0
      while (wi < words.length) { addPairs(wi, init); wi += 1 }
      init.foreach(k => pairCnt.get(k).foreach(c => heap.enqueue((c, k))))
      val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var rank = 1
      var exhausted = false
      while (rank <= numMerges && !exhausted) {
        // lazy deletion: an entry is valid iff it carries the CURRENT count
        var best: String = null
        var bestCnt = 0L
        while (best == null && heap.nonEmpty) {
          val (c, k) = heap.dequeue()
          if (c > 0 && pairCnt.getOrElse(k, 0L) == c) { best = k; bestCnt = c }
        }
        if (best == null) exhausted = true // fully merged: nothing recorded
        else {
          val sp = best.indexOf(' ') // symbols never contain spaces
          val lhs = best.substring(0, sp)
          val rhs = best.substring(sp + 1)
          out += ((rank, lhs, rhs, bestCnt))
          val touched = mutable.HashSet.empty[String]
          pairWords.remove(best).foreach(_.foreach { w =>
            val s = words(w)
            val ns = applyRule(s, lhs, rhs)
            if (ns ne s) { // stale index entries simply never fire
              subPairs(w, touched)
              words(w) = ns
              addPairs(w, touched)
            }
          })
          touched.foreach(k => pairCnt.get(k).foreach(c => heap.enqueue((c, k))))
          rank += 1
        }
      }
      out.toArray
    }
  }

  def load(spark: SparkSession, dir: String): BpeModel = {
    val meta = spark.read.parquet(s"$dir/meta")
    val row = meta.select("num_merges").collect()
    require(row.length == 1, s"load: malformed meta at $dir/meta")
    val nm = row(0).getInt(0)
    val merges = spark.read.parquet(s"$dir/merges")
    // the rank column must be EXACTLY 1..count (ADVICE r16: max<=nm &&
    // count<=nm alone admits duplicate or gapped rank tables, and
    // mergesArr would then apply a corrupted rule sequence)
    val mx = merges.agg(min(col("rank")), max(col("rank")), count(lit(1)),
      countDistinct(col("rank"))).collect()(0)
    require(mx.isNullAt(0) || (mx.getInt(0) == 1 &&
        mx.getInt(1) <= nm && mx.getInt(1).toLong == mx.getLong(2) &&
        mx.getLong(2) == mx.getLong(3)),
      s"load: $dir merges carry ranks [${mx.get(0)}, ${mx.get(1)}] over " +
        s"${mx.get(2)} rows (${mx.get(3)} distinct), stamped " +
        s"num_merges=$nm — refusing a non-contiguous rank table")
    BpeModel(merges, meta)
  }
}
