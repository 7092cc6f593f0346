package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs after
  * dedup/quality gating: sequence packing (concat-and-chunk into
  * fixed-token training sequences) and mixture-matching subsampling
  * (largest subset achieving a target domain mixture exactly).
  *
  * Both are pure window/aggregate plans — no UDFs, no state — so
  * Catalyst prunes and pushes through them like any other query.
  */
object Curation {

  /** Concat-and-chunk sequence packing (the GPT-style pregrouping:
    * documents are concatenated in deterministic order and split into
    * fixed `ctx`-token training sequences; a document may straddle a
    * sequence boundary). Packing is PER `source` — each source packs
    * its own stream independently, so the running sum is a per-group
    * window, never a global sort; at 100 TB you shard further (e.g.
    * source × date) and the shape is unchanged.
    *
    * Output: one row per (source, seq_id) with n_docs (documents
    * overlapping the sequence), n_docs_started (documents whose first
    * token lands in it), n_tokens (= ctx except each source's last
    * sequence). Token positions are exact integer arithmetic over a
    * running token sum; the doc→sequence fanout is explode(sequence),
    * ~|doc|/ctx rows per doc.
    */
  def packSequences(docs: DataFrame, ctx: Int = 512): DataFrame =
    // token counts map-side; only (source, doc_id, n_tok) reaches the
    // window shuffle — document text never crosses the wire
    packSequencesWithCounts(
      docs.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")), ctx)

  /** [[packSequences]] over PRECOMPUTED per-document token counts —
    * the hook that lets packing budget by any tokenizer (the learned
    * BPE counts of graft.operators.BpeTokenizer.encodeCounts, a
    * provider tokenizer's counts ingested as a column, …) instead of
    * the whitespace default. `counted` carries
    * (source, doc_id, n_tok). */
  def packSequencesWithCounts(counted: DataFrame, ctx: Int = 512): DataFrame = {
    require(ctx >= 1, "ctx must be >= 1")
    // ROWS frame, not the orderBy default of RANGE-to-current-row: under
    // RANGE, tied doc_ids would sum together and corrupt token positions.
    // n_tok as secondary sort makes tied doc_ids deterministic across
    // engines/replays; docs tied on BOTH keys are interchangeable in
    // every output column (the aggregates carry no doc identity), so
    // the result is total-order-independent.
    val w = Window.partitionBy("source").orderBy("doc_id", "n_tok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .select(col("source"), col("doc_id"), col("n_tok"))
      .withColumn("end_tok", sum("n_tok").over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tok"))
      .withColumn("seq_id", explode(sequence(
        expr(s"start_tok div $ctx"), expr(s"(end_tok - 1) div $ctx"))))
      .groupBy("source", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("start_tok") >= col("seq_id") * ctx, 1L)
          .otherwise(0L)).as("n_docs_started"),
        sum(least(col("end_tok"), (col("seq_id") + 1) * ctx) -
          greatest(col("start_tok"), col("seq_id") * ctx)).as("n_tokens"))
  }

  /** Mixture-matching subsample: keep the LARGEST subset of the corpus
    * whose `lang` distribution matches integer target weights exactly
    * (up to floor rounding) — the deterministic form of domain
    * reweighting (DoReMi-style target mixtures applied by subsampling).
    *
    * T = min over langs of (n_lang * scale) div w_lang is the largest
    * feasible total; each lang keeps its (T * w_lang) div scale
    * lowest-hash docs (multiplicative Knuth hash, doc_id tiebreak — the
    * same engine-replayable family as stratified sampling), so the
    * binding lang keeps ~all its docs and every other lang is downsampled
    * to proportion.
    *
    * Returns per-doc rows (doc_id, lang, n_chars, wt, kept). Exact-k
    * selection ranks within each lang (one skewed shuffle); at 100 TB
    * swap the rank for a per-lang hash THRESHOLD (rate = k_l/n_l, as in
    * stratified sampling) and accept ±binomial noise on the mixture —
    * the rest of the plan is unchanged.
    */
  def mixtureSample(docs: DataFrame, weights: Map[String, Long],
      scale: Long = 100L): DataFrame =
    mixtureSelect(docs, "n_chars", weights, scale, byMass = false)

  /** [[mixtureSample]] weighted by TOKEN MASS instead of document
    * count — the packSequencesWithCounts hook applied to mixtures
    * (VERDICT r15 item 1: doc_mixture accepting learned BPE counts).
    * `counted` carries (doc_id, lang, n_tok) from any tokenizer;
    * feasibility and the per-lang budgets are over token totals
    * (T = min over langs of (tok_lang * scale) div w_lang), and a doc
    * is kept while its RUNNING token sum — same deterministic
    * (multiplicative-hash, doc_id) order as the doc-count form — fits
    * the lang's token budget. Same shuffle shape: one per-lang window
    * over (doc_id, lang, n_tok); text never moves. */
  def mixtureSampleWithCounts(counted: DataFrame, weights: Map[String, Long],
      scale: Long = 100L): DataFrame =
    mixtureSelect(counted, "n_tok", weights, scale, byMass = true)

  /** The shared mixture engine behind both public forms: feasibility
    * and per-lang budgets over `valueCol`'s totals (row counts when
    * `byMass` is false — every row costs 1 — or summed `valueCol`
    * mass), selection in the deterministic (multiplicative Knuth hash,
    * doc_id) order either way. One body so the hash, the feasibility
    * rule, and the never-NULL verdict cannot drift apart between the
    * doc-count and token-mass forms. */
  private def mixtureSelect(rows: DataFrame, valueCol: String,
      weights: Map[String, Long], scale: Long, byMass: Boolean): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val spark = rows.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF("lang", "wt")
    val base = rows
      .select(col("doc_id"), col("lang"), col(valueCol))
      .join(broadcast(wdf), Seq("lang"))
      .withColumn("bucket",
        ((col("doc_id") % 1597334677L) * 2654435761L) % 4294967296L)
    // Feasibility is over the WEIGHT list, not the observed langs: a
    // weighted lang absent from the corpus caps the mixture at zero
    // (n_total = 0) instead of silently vanishing from the constraint.
    // broadcast the counts (≤ one row per lang): a left outer join can
    // only build its RIGHT side, so hinting the weight side would be
    // silently ignored
    val perLangTotal = if (byMass) sum(valueCol) else count(lit(1))
    val tMax = wdf
      .join(broadcast(base.groupBy("lang").agg(perLangTotal.as("n_total"))),
        Seq("lang"), "left")
      .withColumn("n_total", coalesce(col("n_total"), lit(0L)))
      .agg(min(expr(s"(n_total * $scale) div wt")).as("t_max"))
    val ww = Window.partitionBy("lang").orderBy("bucket", "doc_id")
    val pos =
      if (byMass) sum(valueCol).over(
        ww.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else row_number().over(ww)
    base
      .withColumn("pos", pos)
      .join(broadcast(tMax))
      // kept is a verdict, never NULL — degenerate inputs read as drop
      .withColumn("kept",
        coalesce(col("pos") <= expr(s"(t_max * wt) div $scale"), lit(false)))
      .select("doc_id", "lang", valueCol, "wt", "kept")
  }

  /** Duplicate-span REMOVAL (Lee et al. 2022: excise repeated
    * substrings so memorized spans survive once, instead of dropping
    * whole near-dup documents) — the excision step over
    * `doc_dup_spans`'s posting lists (VERDICT r15 item 4).
    *
    * Semantics: spans are word `n`-grams occurring in ≥ 2 DISTINCT
    * documents (the doc_dup_spans definition; within-doc-only
    * repetition is the repetition FILTER's job, #50). Every occurrence
    * of a duplicated span is ranked by the deterministic corpus order
    * (doc_id, position); the rank-1 occurrence is the canonical copy.
    * A word is excised iff it is covered by some non-canonical
    * occurrence AND not covered by any canonical one — the protection
    * rule that keeps canonical copies intact when spans overlap (e.g.
    * the two overlapping instances a run of repeated words generates,
    * or a canonical copy of span A sharing words with a removed copy
    * of span B).
    *
    * Scale shape: pure posting lists — only (span, doc_id, pos) and
    * (doc_id, idx) pairs shuffle, never text; the canonical occurrence
    * is a partial-agg min(struct(doc_id, pos)) per span (map-side
    * combine, no rank window), and coverage/excision are
    * explode + distinct + anti-join on (doc_id, idx). Text is
    * reassembled once per surviving doc from its own words.
    *
    * Returns one row per input doc: (doc_id, n_words, n_kept,
    * n_removed, text_clean) with n_words = n_kept + n_removed by
    * construction (token conservation is checkable per row). */
  def removeDupSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 2, "span length must be >= 2 words")
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val words = ws.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("idx", "word")))
    val occ = ws.select(col("doc_id"),
      posexplode(graft.functions.NGramInstances.column(col("ws"), n))
        .as(Seq("pos", "span")))
    val dup = occ.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("span")
    val docc = occ.join(dup, "span")
    // canonical copy per span: min over the (doc_id, pos) corpus order
    // — an aggregation, not a rank window, so a hyper-duplicated span
    // partial-aggregates map-side instead of sorting one giant group
    val first = docc.groupBy("span")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("span"), col("f.doc_id").as("fdoc"), col("f.pos").as("fpos"))
    val flagged = docc.join(first, "span")
      .withColumn("canonical",
        col("doc_id") === col("fdoc") && col("pos") === col("fpos"))
    val excised = cover(flagged.filter(!col("canonical")), n)
      .join(cover(flagged.filter(col("canonical")), n),
        Seq("doc_id", "idx"), "left_anti")
    rebuildExcised(ws, words, excised)
  }

  /** Word-index cover of span occurrences: (doc_id, idx) for every
    * word position any (doc_id, pos) span row touches. */
  private def cover(c: DataFrame, n: Int): DataFrame = c
    .select(col("doc_id"),
      explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("idx"))
    .distinct()

  /** Shared excision tail of the span family: drop `excised`
    * (doc_id, idx) word positions from `words`, reassemble per-doc
    * text in index order, and account n_words = n_kept + n_removed
    * (token conservation — CurationSpec pins it per row). */
  private def rebuildExcised(ws: DataFrame, words: DataFrame,
      excised: DataFrame): DataFrame = {
    val rebuilt = words.join(excised, Seq("doc_id", "idx"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("word")))),
          x => x.getField("word")), " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
    ws.select(col("doc_id"), size(col("ws")).cast("long").as("n_words"))
      .join(rebuilt, Seq("doc_id"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("n_removed", col("n_words") - col("n_kept"))
      .withColumn("text_clean", coalesce(col("text_clean"), lit("")))
      .select("doc_id", "n_words", "n_kept", "n_removed", "text_clean")
  }

  /** Span-level benchmark decontamination — the EXCISION form of Lee
    * et al. 2022 §6.2 (whole-doc flagging is
    * [[graft.operators.TextDedup.crossCorpusOverlap]]): every train
    * occurrence of any word n-gram that appears anywhere in the
    * benchmark corpus is cut out of the training text; the benchmark
    * itself is never modified. This is [[removeDupSpans]] with the
    * canonical-protection rule replaced by "bench occurrences are
    * never canonical" — train-side copies are all excised, and no
    * train-side canonical cover protects a contaminated word.
    *
    * 100 TB scale: the bench side reduces to a DISTINCT span-string
    * set (eval suites are MBs — AQE broadcasts it), so the only
    * corpus-sized shuffles are the train posting rows keyed by span
    * string and the (doc_id, idx) excision cover; document text
    * reassembles once per doc in the final aggregate, exactly like
    * [[removeDupSpans]]. Output: (doc_id, n_words, n_kept,
    * n_removed, text_clean) over the train corpus only. */
  def decontaminateSpans(train: DataFrame, bench: DataFrame,
      n: Int = 8): DataFrame =
    decontaminateSpansAgainst(train, benchSpanSet(bench, n), n)

  /** The DISTINCT span-string set of a benchmark corpus — the frozen
    * side of span-level decontamination (distinct-per-doc via
    * ShingleNGrams is enough: only span identity matters on the bench
    * side, never positions). Streaming callers build it once and
    * persist it for the query lifetime. */
  def benchSpanSet(bench: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 2, "span length must be >= 2 words")
    bench
      .select(explode(graft.functions.ShingleNGrams.column(
        split(col("text"), " "), n)).as("span"))
      .distinct()
  }

  /** [[decontaminateSpans]] against a PREBUILT bench span set — the
    * streaming form: a doc's excision depends on nothing but its own
    * words and the frozen span set, so per-batch outputs union to the
    * batch sweep (parity by construction, pinned in
    * DecontaminateSpec). */
  def decontaminateSpansAgainst(train: DataFrame, benchSpans: DataFrame,
      n: Int = 8): DataFrame = {
    require(n >= 2, "span length must be >= 2 words")
    val ws = train.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val words = ws.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("idx", "word")))
    val occ = ws.select(col("doc_id"),
      posexplode(graft.functions.NGramInstances.column(col("ws"), n))
        .as(Seq("pos", "span")))
    val excised = cover(occ.join(benchSpans, "span"), n)
    rebuildExcised(ws, words, excised)
  }
}
