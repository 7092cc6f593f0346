package graft.queries

import graft.{QueryMemo, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The learned-subword-tokenizer query tier (SURVEY §2c, VERDICT r15
  * item 1): BPE merge-table training, corpus encoding, and
  * BPE-budgeted sequence packing — all oracle-replayable because
  * training and encoding are pure integer/string arithmetic with a
  * deterministic (count DESC, pair ASC) tie-break. The DuckDB twins
  * replay the training loop itself as a GENERATED unrolled-merge CTE
  * chain (one pair-count + argmax + list_reduce-fold block per round —
  * the emb_ann_ivfpq generated-oracle pattern), so the learned table
  * is hash-matched end to end, not assumed.
  */
object Tokenize {

  /** One merge table per (session, corpus), memoized: all three
    * queries (and a Verify/Bench pass runs them back to back) consume
    * the same 16-round training product; the memo holds ≤16 rows. */
  private val NumMerges = 16

  private def merges(s: SparkSession, d: String): DataFrame =
    // r21: the one-aggregate trainer — byte-identical merge table to
    // the round-per-job loop (BpeSpec pins trainAgg ≡ train), built in
    // ONE corpus pass + ONE reduce instead of 2·16 shuffle rounds; the
    // unrolled 16-round DuckDB oracle below still verifies every rank
    QueryMemo.cached(s, s"bpe_merges:m=$NumMerges:$d")(
      graft.operators.BpeTokenizer
        .trainAgg(Tables.documents(s, d), NumMerges).merges)

  private def model(s: SparkSession, d: String)
      : graft.operators.BpeTokenizer.BpeModel = {
    import s.implicits._
    graft.operators.BpeTokenizer.BpeModel(
      merges(s, d), Seq(NumMerges).toDF("num_merges"))
  }

  /** #45b The learned BPE merge table itself — 16 rounds of
    * highest-frequency adjacent-pair merges over the corpus vocabulary
    * (rank, lhs, rhs, cnt). Deterministic by construction, so the
    * whole TRAINING loop is oracle-verified, not just an encode of a
    * fixed table. */
  def docBpe(s: SparkSession, d: String): DataFrame = merges(s, d)

  /** #45c Corpus encoding against the learned table: per-source BPE
    * token accounting via the dictionary path (distinct words encode
    * once through the codegen'd BpeApplyMerges kernel; instances join
    * back — the join is the scale story, the kernel never runs per
    * occurrence). */
  def docBpeTokens(s: SparkSession, d: String): DataFrame = {
    val inst = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val dict = graft.operators.BpeTokenizer
      .encodeWords(inst.select("word").distinct(), model(s, d))
      .select("word", "n_sub")
    inst.join(dict, "word")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum("n_sub").as("sum_bpe_tokens"),
        max(col("n_sub")).cast("long").as("max_word_subwords"))
  }

  /** #57b Sequence packing budgeted by LEARNED token counts (VERDICT
    * r15 item 1: "doc_pack accepting BPE counts") — the doc_pack
    * composition with n_tok = the per-document BPE token sum instead
    * of the whitespace count. Same window shape: only
    * (source, doc_id, n_tok) reaches the shuffle. */
  def docPackBpe(s: SparkSession, d: String): DataFrame = {
    val inst = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val dict = graft.operators.BpeTokenizer
      .encodeWords(inst.select("word").distinct(), model(s, d))
      .select("word", "n_sub")
    val counted = inst.join(dict, "word")
      .groupBy("source", "doc_id")
      .agg(sum("n_sub").as("n_tok"))
    graft.operators.Curation
      .packSequencesWithCounts(counted, ctx = 512)
  }

  /** #58b Mixture-matching subsample budgeted by LEARNED token mass
    * (the other half of VERDICT r15 item 1): doc_mixture's feasibility
    * and per-lang budgets computed over BPE token totals instead of
    * document counts — a lang of long documents now weighs what it
    * costs a training run, not how many rows it has. Same deterministic
    * (multiplicative-hash, doc_id) keep order; one per-lang window. */
  def docMixtureBpe(s: SparkSession, d: String): DataFrame = {
    val inst = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val dict = graft.operators.BpeTokenizer
      .encodeWords(inst.select("word").distinct(), model(s, d))
      .select("word", "n_sub")
    val counted = inst.join(dict, "word")
      .groupBy("doc_id", "lang")
      .agg(sum("n_sub").as("n_tok"))
    graft.operators.Curation
      .mixtureSampleWithCounts(counted,
        Map("en" -> 30L, "es" -> 25L, "zh" -> 20L, "de" -> 15L, "fr" -> 10L))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"), max("wt").as("target_pct"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("kept_tokens"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_bpe" -> (docBpe _),
    "doc_bpe_tokens" -> (docBpeTokens _),
    "doc_pack_bpe" -> (docPackBpe _),
    "doc_mixture_bpe" -> (docMixtureBpe _))

  /** The generated unrolled-merge CTE chain: w0/s0 (vocabulary +
    * char segmentation), then per round r: p{r} (weighted adjacent
    * pair counts), b{r} (argmax with the dummy guard and the
    * (cnt DESC, pair ASC) tie-break), s{r} (the greedy left-to-right
    * fold via list_reduce — the same sequential semantics as the
    * BpeApplyMerges kernel, symbol-exact).
    *
    * Two DuckDB-verified hazards (VERDICT r16 "What's wrong" 1-2):
    * no generated line may BEGIN with whitespace-then-`|` (the outer
    * oracle templates apply `.stripMargin` to the interpolated whole,
    * which would eat the first pipe of a leading `||` and turn string
    * concat into bitwise-or — hence the trailing-`||` line breaks
    * below), and every CTE is `AS MATERIALIZED`: each s{r} is
    * referenced twice (by p{r+1}/b{r+1} and s{r+1}), so un-hinted
    * inlining expands 2^m times and the query never returns. */
  private def bpeCtes(m: Int): String = {
    val base =
      """w0 AS MATERIALIZED (SELECT word, COUNT(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |  WHERE length(word) > 0 GROUP BY 1),
        |s0 AS MATERIALIZED (SELECT word, n,
        |  list_transform(range(1, length(word) + 1),
        |    i -> substr(word, i, 1)) AS syms FROM w0)""".stripMargin
    val rounds = (1 to m).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM (
         |    SELECT n, unnest(list_transform(range(1, len(syms)),
         |      i -> syms[i] || ' ' || syms[i+1])) AS pair
         |    FROM s${r - 1}) t GROUP BY 1),
         |b$r AS MATERIALIZED (
         |  SELECT $r AS rank, string_split(pair, ' ')[1] AS lhs,
         |    string_split(pair, ' ')[2] AS rhs, cnt
         |  FROM (SELECT pair, cnt FROM (
         |      SELECT pair, cnt FROM p$r
         |      UNION ALL SELECT ' ', CAST(-1 AS BIGINT)) u
         |    ORDER BY cnt DESC, pair ASC LIMIT 1) q),
         |s$r AS MATERIALIZED (SELECT word, n,
         |    string_split(list_reduce(syms, (acc, x) ->
         |      CASE WHEN string_split(acc, ' ')[-1] = b.lhs AND x = b.rhs
         |           THEN substr(acc, 1, length(acc) - length(b.lhs)) ||
         |                b.lhs || b.rhs
         |           ELSE acc || ' ' || x END), ' ') AS syms
         |  FROM s${r - 1}, b$r b)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  private def mergeUnion(m: Int): String =
    (1 to m).map(r => s"SELECT * FROM b$r").mkString("\n  UNION ALL ")

  private val dictCte: String =
    s"dict AS (SELECT word, len(syms) AS n_sub FROM s$NumMerges)"

  val oracles: Map[String, String] = Map(
    "doc_bpe" ->
      s"""WITH ${bpeCtes(NumMerges)}
         |SELECT rank, lhs, rhs, cnt FROM (
         |  ${mergeUnion(NumMerges)}) mm
         |WHERE cnt > 0""".stripMargin,
    "doc_bpe_tokens" ->
      s"""WITH ${bpeCtes(NumMerges)},
         |$dictCte,
         |inst AS (SELECT source, word FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS word
         |    FROM documents) t
         |  WHERE length(word) > 0)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_sub) AS BIGINT) AS sum_bpe_tokens,
         |  CAST(MAX(n_sub) AS BIGINT) AS max_word_subwords
         |FROM inst JOIN dict USING (word) GROUP BY 1""".stripMargin,
    "doc_pack_bpe" ->
      s"""WITH ${bpeCtes(NumMerges)},
         |$dictCte,
         |cnts AS (
         |  SELECT source, doc_id, CAST(SUM(n_sub) AS BIGINT) AS n_tok
         |  FROM (SELECT source, doc_id,
         |      unnest(string_split(text, ' ')) AS word FROM documents) i
         |  JOIN dict USING (word)
         |  WHERE length(word) > 0
         |  GROUP BY 1, 2),
         |t AS (
         |  SELECT source, doc_id, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY source
         |      ORDER BY doc_id, n_tok
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_tok
         |  FROM cnts),
         |ss AS (SELECT source, doc_id, n_tok, end_tok,
         |        end_tok - n_tok AS start_tok FROM t),
         |e AS (SELECT source, start_tok, end_tok,
         |        unnest(range(start_tok // 512, (end_tok - 1) // 512 + 1))
         |          AS seq_id
         |      FROM ss)
         |SELECT source, seq_id, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN start_tok >= seq_id * 512 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_docs_started,
         |  CAST(SUM(least(end_tok, (seq_id + 1) * 512)
         |         - greatest(start_tok, seq_id * 512)) AS BIGINT) AS n_tokens
         |FROM e GROUP BY 1, 2""".stripMargin,
    "doc_mixture_bpe" ->
      s"""WITH ${bpeCtes(NumMerges)},
         |$dictCte,
         |cnts AS (
         |  SELECT doc_id, lang, CAST(SUM(n_sub) AS BIGINT) AS n_tok
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split(text, ' ')) AS word FROM documents) i
         |  JOIN dict USING (word)
         |  WHERE length(word) > 0
         |  GROUP BY 1, 2),
         |b AS (
         |  SELECT doc_id, lang, n_tok,
         |    CASE lang WHEN 'en' THEN 30 WHEN 'es' THEN 25 WHEN 'zh' THEN 20
         |              WHEN 'de' THEN 15 WHEN 'fr' THEN 10 ELSE 0 END AS wt,
         |    ((doc_id % 1597334677) * 2654435761) % 4294967296 AS bucket
         |  FROM cnts
         |  WHERE lang IN ('en','es','zh','de','fr')),
         |t AS (SELECT MIN((COALESCE(n_total, 0) * 100) // wt) AS t_max
         |  FROM (VALUES ('en',30),('es',25),('zh',20),('de',15),('fr',10))
         |    w(lang, wt)
         |  LEFT JOIN (SELECT lang, SUM(n_tok) AS n_total FROM b GROUP BY 1) c
         |    USING (lang)),
         |r AS (SELECT b.*, SUM(n_tok) OVER (PARTITION BY lang
         |    ORDER BY bucket, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tok
         |  FROM b)
         |SELECT lang, COUNT(*) AS n_total, CAST(MAX(wt) AS BIGINT) AS target_pct,
         |  CAST(SUM(CASE WHEN cum_tok <= ((SELECT t_max FROM t) * wt) // 100
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN cum_tok <= ((SELECT t_max FROM t) * wt) // 100
         |    THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM r GROUP BY 1""".stripMargin)
}
