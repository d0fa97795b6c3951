package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import Tables._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and packing: unigram-LM quality scoring (the perplexity-proxy
  * filter), temperature-scaled source mixing (the DoReMi/Dolma-style
  * mixture computation), and the deterministic sampling pass that
  * applies the mixture.
  *
  * Determinism discipline (see [[Tables]]): every cross-row sum is over
  * exact BIGINTs — per-token negative-log-likelihoods are quantized to
  * integer micro-nats BEFORE aggregation, mixture weights to integer
  * micro-units via IEEE-exact `sqrt` (correctly rounded by both
  * engines, unlike `pow`) — so the DuckDB oracles replay every value
  * bit-for-bit; the only doubles in any output are single divisions of
  * deterministic integer operands.
  */
object Curation {

  private def tokens = graft.functions.TextFunctions.ascii_words(col("text"))
  private val sqlTokens = "regexp_extract_all(lower(text), '[a-z]+')"

  /** Quantize a natural log to integer micro-nats: both engines
    * evaluate `ln` on the same IEEE operand; a 1-ulp `ln` disagreement
    * flips the floor only when `x*1e6` sits within ~2e-9 of an integer
    * — negligible over a bounded vocabulary, and exact sums of the
    * resulting BIGINTs are order-independent where a `sum(double)` of
    * raw logs would not be.
    */
  private def nllMicro(p: Column): Column =
    floor(log(p) * 1e6).cast("long")

  /** Per-source token statistics: the input to mixing and sampling. */
  private def sourceStats(s: SparkSession, dir: String): DataFrame =
    tBalanced(s, dir, "documents")
      .select(col("source"), size(tokens).as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))

  /** Temperature-scaled (alpha = 0.5) mixture over [[sourceStats]]:
    * `w_s = sqrt(n_s) / sum sqrt(n_s)` in integer micro-units, plus the
    * per-source keep-rate that lands a `total/4`-token budget. All
    * integer arithmetic after the one exact `sqrt`; the window total is
    * over the handful of source rows, not the corpus.
    */
  private def mixRates(s: SparkSession, dir: String): DataFrame =
    sourceStats(s, dir)
      .withColumn("w_micro",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
      .withColumn("tot_w", sum("w_micro").over(Window.partitionBy()))
      .withColumn("tot_tokens", sum("n_tokens").over(Window.partitionBy()))
      .withColumn("tgt_tokens",
        expr("(tot_tokens div 4) * w_micro div tot_w"))
      .withColumn("rate_micro",
        expr("least(1000000L, tgt_tokens * 1000000L div n_tokens)"))

  // the same mixture as a DuckDB CTE chain (`//` = integer division)
  private val sqlMixCte =
    s"""tok AS (
          SELECT doc_id, source, len($sqlTokens) AS nt FROM documents),
        st AS (
          SELECT source, COUNT(*) AS n_docs, SUM(nt) AS n_tokens
          FROM tok GROUP BY source),
        wst AS (
          SELECT *, CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1000000.0)
            AS BIGINT) AS w_micro FROM st),
        tots AS (
          SELECT *, SUM(w_micro) OVER () AS tot_w,
            SUM(n_tokens) OVER () AS tot_tokens FROM wst),
        rates AS (
          SELECT *, (tot_tokens // 4) * w_micro // tot_w AS tgt_tokens,
            LEAST(1000000, ((tot_tokens // 4) * w_micro // tot_w)
              * 1000000 // n_tokens) AS rate_micro
          FROM tots)"""

  val defs: Seq[QueryDef] = Seq(
    // Unigram-LM negative log-likelihood — the perplexity-proxy quality
    // signal (CCNet/KenLM-style, one-gram order): the corpus IS the
    // model, each token scores -ln(count/total), documents average
    // their tokens. Scale shape: one shuffle builds the vocabulary
    // (unigram models stay small enough to broadcast — ~1M types is a
    // few MB), the scoring pass is a broadcast join + per-source fold,
    // so the corpus is never shuffled by anything wider than `source`.
    // NLLs aggregate as exact micro-nat BIGINTs (see nllMicro);
    // avg_nll is the single terminal division.
    QueryDef("t_lm_score",
      (s, dir) => {
        val tok = tBalanced(s, dir, "documents")
          .select(col("doc_id"), col("source"), explode(tokens).as("tok"))
        val vocab = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .withColumn("total", sum("cnt").over(Window.partitionBy()))
          .select(col("tok"),
            nllMicro(col("total").cast("double") / col("cnt"))
              .as("nll_micro"))
        tok.join(broadcast(vocab), Seq("tok"))
          .groupBy("source")
          .agg(countDistinct("doc_id").as("n_docs"),
            count(lit(1)).as("n_tokens"),
            sum("nll_micro").as("sum_nll_micronats"))
          .withColumn("avg_nll_micronats",
            col("sum_nll_micronats").cast("double") / col("n_tokens"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (
          SELECT doc_id, source, unnest($sqlTokens) AS tok FROM documents),
        v AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
        tv AS (
          SELECT tok, CAST(FLOOR(LN(
              CAST((SELECT COUNT(*) FROM tok) AS DOUBLE) / cnt) * 1000000.0)
            AS BIGINT) AS nll_micro
          FROM v)
        SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
          COUNT(*) AS n_tokens,
          CAST(SUM(nll_micro) AS BIGINT) AS sum_nll_micronats,
          CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*) AS avg_nll_micronats
        FROM tok JOIN tv USING (tok)
        GROUP BY source ORDER BY source""")),

    // Temperature-scaled source mixing (alpha = 0.5): upweight the
    // tail sources, downweight the head — the mixture step every
    // multi-source pretraining corpus runs (DoReMi, Dolma, The Pile
    // all publish such weights). Output: the weight, the token target
    // under a total/4 budget, and the keep-rate the sampler applies.
    // One aggregation over the corpus; everything after is arithmetic
    // over one row per source.
    QueryDef("d_source_mix",
      (s, dir) => mixRates(s, dir)
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("w_micro"),
          (col("w_micro").cast("double") / col("tot_w")).as("weight"),
          col("tgt_tokens"), col("rate_micro"))
        .orderBy("source"),
      Some(s"""WITH $sqlMixCte
        SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
          w_micro, CAST(w_micro AS DOUBLE) / tot_w AS weight,
          CAST(tgt_tokens AS BIGINT) AS tgt_tokens,
          CAST(rate_micro AS BIGINT) AS rate_micro
        FROM rates ORDER BY source""")),

    // APPLY the mixture: per-source deterministic md5 gate at the
    // computed keep-rate (`h60(doc_id) mod 1e6 < rate`), so the sample
    // is reproducible on any cluster size, re-run, or re-shard, and a
    // document's fate never depends on which partition it landed in.
    // Scale shape: the rate table (one row per source) broadcasts back
    // onto the corpus — map-only after the stats pass; no second wide
    // shuffle. The realized token counts land within gate-granularity
    // of tgt_tokens, which is the property d_source_mix promised.
    QueryDef("d_mix_sample",
      (s, dir) => {
        val docTok = tBalanced(s, dir, "documents")
          .select(col("doc_id"), col("source"), size(tokens).as("nt"))
        val rates = mixRates(s, dir).select("source", "rate_micro")
        val kept = pmod(h60s(col("doc_id")), lit(1000000L)) < col("rate_micro")
        docTok.join(broadcast(rates), Seq("source"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(kept, 1L).otherwise(0L)).as("n_kept_docs"),
            sum(when(kept, col("nt")).otherwise(0L)).as("n_kept_tokens"),
            max("rate_micro").as("rate_micro"))
          .orderBy("source")
      },
      Some(s"""WITH $sqlMixCte
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN ${sqlH60s("CAST(doc_id AS VARCHAR)")} % 1000000
              < rate_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_docs,
          CAST(SUM(CASE WHEN ${sqlH60s("CAST(doc_id AS VARCHAR)")} % 1000000
              < rate_micro THEN nt ELSE 0 END) AS BIGINT) AS n_kept_tokens,
          CAST(MAX(rate_micro) AS BIGINT) AS rate_micro
        FROM tok JOIN rates USING (source)
        GROUP BY source ORDER BY source"""))
  )
}
