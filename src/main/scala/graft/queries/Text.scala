package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token counting, quality scoring, stopword/ratio
  * features, fingerprinting, language profiling. All expressions stay
  * inside whole-stage codegen (no UDFs); divisions are single ops over
  * exact integer counts so the DuckDB oracle matches bit-for-bit.
  */
object Text {

  // Tokens = maximal [a-z]+ runs of the lowercased text; the same regex
  // evaluates identically in Spark (Java regex) and DuckDB (RE2).
  private def tokens = graft.functions.TextFunctions.ascii_words(col("text"))
  private val sqlTokens = "regexp_extract_all(lower(text), '[a-z]+')"

  val defs: Seq[QueryDef] = Seq(
    // Context-window packing (concat-and-chunk): docs are laid out in
    // doc_id order per lang and cut into fixed 2048-token windows —
    // the sequence-packing step that turns a filtered corpus into
    // training examples. A cumulative sum over a window computes every
    // doc's token offset; window count and boundary-crossing docs are
    // pure integer functions of the offsets, so the oracle is the same
    // SUM OVER. One shuffle (the per-lang sort), no UDFs.
    QueryDef("t_pack_context_windows",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val W = 2048
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "documents")
          .select(col("lang"), col("doc_id"), size(tokens).as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            ceil(max("cum").cast("double") / W).cast("long").as("n_windows"),
            sum(when(col("n_tokens") > 0 &&
              floor((col("cum") - col("n_tokens")) / W)
                =!= floor((col("cum") - 1) / W), 1L).otherwise(0L))
              .as("n_docs_split"))
          .orderBy("lang")
      },
      Some(s"""WITH toks AS (
          SELECT lang, doc_id, len($sqlTokens) AS n_tokens FROM documents),
        cums AS (
          SELECT lang, doc_id, n_tokens,
            SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM toks)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
          CAST(CEIL(CAST(MAX(cum) AS DOUBLE) / 2048) AS BIGINT) AS n_windows,
          CAST(SUM(CASE WHEN n_tokens > 0
                          AND FLOOR((cum - n_tokens) / 2048)
                            <> FLOOR((cum - 1) / 2048)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_split
        FROM cums GROUP BY lang ORDER BY lang""")),

    // SHARD the corpus — the terminal step of data prep (after dedup/
    // filter/pack, the surviving documents are hash-assigned to N
    // output shards a training job streams). Deterministic md5 gate
    // (h60 % 64): a document's shard never depends on cluster size,
    // partitioning, or re-runs — the same reproducibility argument as
    // t_hash_sample. The rollup is the balance readout a pipeline
    // alerts on: per-shard token counts should be tight around the
    // mean (hash-balance), and max/min is the imbalance a skewed
    // tokenizer or a pathological hash would show. One shuffle on the
    // 64-value shard key; the summary is a 64-row aggregate.
    QueryDef("t_shard_assignment",
      (s, dir) => {
        val NShards = 64L
        t(s, dir, "documents")
          .select(col("doc_id"), size(tokens).as("nt"))
          .select((h60s(col("doc_id")) % NShards).as("shard"), col("nt"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
          .agg(count(lit(1)).as("n_shards"),
            sum("n_docs").as("n_docs"),
            sum("n_tokens").as("n_tokens"),
            min("n_tokens").as("min_shard_tokens"),
            max("n_tokens").as("max_shard_tokens"))
          .select(col("n_shards"), col("n_docs"), col("n_tokens"),
            col("min_shard_tokens"), col("max_shard_tokens"),
            // explicit NULL when a shard holds zero tokens: Spark's
            // non-ANSI divide returns NULL for x/0 but DuckDB returns
            // +Inf (IEEE ops default) — guard both sides identically
            when(col("min_shard_tokens") > 0,
              col("max_shard_tokens").cast("double")
                / col("min_shard_tokens")).as("imbalance"))
      },
      Some(s"""WITH sh AS (
          SELECT ${sqlH60s("CAST(doc_id AS VARCHAR)")} % 64 AS shard,
            len($sqlTokens) AS nt
          FROM documents),
        per AS (
          SELECT shard, COUNT(*) AS n_docs, SUM(nt) AS n_tokens
          FROM sh GROUP BY shard)
        SELECT COUNT(*) AS n_shards,
          CAST(SUM(n_docs) AS BIGINT) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
          CAST(MIN(n_tokens) AS BIGINT) AS min_shard_tokens,
          CAST(MAX(n_tokens) AS BIGINT) AS max_shard_tokens,
          CASE WHEN MIN(n_tokens) > 0
               THEN CAST(MAX(n_tokens) AS DOUBLE) / MIN(n_tokens)
               ELSE NULL END AS imbalance
        FROM per""")),

    QueryDef("t_token_count",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens).as("n_tokens"),
          length(col("text")).as("len_chars"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, len($sqlTokens) AS n_tokens,
          length(text) AS len_chars
        FROM documents ORDER BY doc_id""")),

    // BPE-style pre-tokenization (GPT-2-ish pattern: contractions,
    // space-prefixed letter runs, digit runs, symbol runs) — the token
    // count an LLM data pipeline budgets by. The pattern avoids
    // backreferences/lookarounds so Java regex (Spark) and RE2 (DuckDB)
    // split identically.
    QueryDef("t_token_count_bpe",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          expr("""size(regexp_extract_all(lower(text),
            "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+", 0))""")
            .as("n_bpe_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, len(regexp_extract_all(lower(text),
          '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+'))
          AS n_bpe_tokens
        FROM documents ORDER BY doc_id""")),

    // Tokenizer fertility per language — BPE tokens per word and chars
    // per BPE token, the budgeting stats a multilingual pipeline uses
    // to spot languages the tokenizer fragments (high fertility = more
    // compute per word, shorter effective context). Shape: one corpus
    // scan, all three counts computed map-side in codegen, ONE partial-
    // agged shuffle on the small lang enum; ratios are single DOUBLE
    // divisions of exact BIGINT sums, so DuckDB replays them bit-exact.
    // NULLIF guards empty languages on both sides. Scale: at 100 TB
    // this is the same map-reduce as a word count — no join, no
    // per-doc state, partial aggregation absorbs the fan-in.
    QueryDef("t_tokenizer_fertility",
      (s, dir) => t(s, dir, "documents")
        .select(col("lang"),
          size(tokens).as("words"),
          expr("""size(regexp_extract_all(lower(text),
            "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+", 0))""")
            .as("bpe"),
          length(col("text")).as("chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("bpe").as("n_bpe_tokens"),
          sum("words").as("n_words"),
          sum("chars").as("n_chars"),
          (sum("bpe").cast("double") / nullif(sum("words"), lit(0)))
            .as("fertility"),
          (sum("chars").cast("double") / nullif(sum("bpe"), lit(0)))
            .as("chars_per_token"))
        .orderBy("lang"),
      Some(s"""WITH per AS (
          SELECT lang, len($sqlTokens) AS words,
            len(regexp_extract_all(lower(text),
              '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s'']+'))
              AS bpe,
            length(text) AS chars
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
          CAST(SUM(words) AS BIGINT) AS n_words,
          CAST(SUM(chars) AS BIGINT) AS n_chars,
          CAST(SUM(bpe) AS DOUBLE) / NULLIF(CAST(SUM(words) AS BIGINT), 0)
            AS fertility,
          CAST(SUM(chars) AS DOUBLE) / NULLIF(CAST(SUM(bpe) AS BIGINT), 0)
            AS chars_per_token
        FROM per GROUP BY lang ORDER BY lang""")),

    QueryDef("t_word_freq_top20",
      (s, dir) => t(s, dir, "documents")
        .select(explode(tokens).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(20),
      Some(s"""SELECT word, COUNT(*) AS n
        FROM (SELECT unnest($sqlTokens) AS word FROM documents) q
        GROUP BY word ORDER BY n DESC, word LIMIT 20""")),

    // Quality features: token count, mean token length, stopword ratio.
    // Ratios are one exact-int division → bitwise deterministic.
    // NULLIF guards the zero-token case on BOTH sides: Spark's 0.0/0
    // is NULL but DuckDB's is NaN under ieee_floating_point_ops
    // (default-on from 1.1) — x/NULL is NULL in both engines at every
    // version, so a digits/punctuation-only document scores NULL
    // ratios instead of diverging.
    QueryDef("t_quality_score",
      (s, dir) => t(s, dir, "documents")
        .withColumn("toks", tokens)
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          (expr("aggregate(toks, 0L, (a, w) -> a + length(w))").cast("double") /
            nullif(size(col("toks")), lit(0))).as("mean_tok_len"),
          (expr("size(filter(toks, w -> w IN ('the','a','and','of','to')))")
            .cast("double") / nullif(size(col("toks")), lit(0)))
            .as("stopword_ratio"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, len(toks) AS n_tokens,
          (CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
            / NULLIF(len(toks), 0)) AS mean_tok_len,
          (CAST(len(list_filter(toks, w -> w IN ('the','a','and','of','to'))) AS DOUBLE)
            / NULLIF(len(toks), 0)) AS stopword_ratio
        FROM (SELECT doc_id, $sqlTokens AS toks FROM documents) q
        ORDER BY doc_id""")),

    // Per-source decile quality cut — the percentile form of quality
    // filtering (threshold per DOMAIN, not global, so a uniformly
    // lower-quality source isn't wiped out and a high-quality one
    // isn't left untouched). Signal: stopword density in integer
    // micro-units (`n_stop * 1e6 div n_tokens` — exact, so ranks are
    // engine-portable; doc_id tiebreak makes the ordering total).
    // Keep the top 90% per source: rank*10 <= count*9. One shuffle
    // keyed by source; the windows run inside each source partition.
    QueryDef("t_quality_decile_cut",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scored = t(s, dir, "documents")
          .withColumn("toks", tokens)
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), col("source"), size(col("toks")).as("nt"),
            expr("size(filter(toks, w -> w IN ('the','a','and','of','to')))" +
              " * 1000000L div size(toks)").as("qscore"))
        val w = Window.partitionBy("source")
        scored
          .withColumn("rn", row_number().over(Window.partitionBy("source")
            .orderBy(col("qscore").desc, col("doc_id"))))
          .withColumn("c", count(lit(1)).over(w))
          .withColumn("kept", col("rn") * 10 <= col("c") * 9)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            min(when(col("kept"), col("qscore"))).as("decile_threshold"),
            sum(when(col("kept"), col("nt")).otherwise(0L))
              .as("n_tokens_kept"))
          .orderBy("source")
      },
      Some(s"""WITH sc AS (
          SELECT doc_id, source, len(toks) AS nt,
            len(list_filter(toks, w -> w IN ('the','a','and','of','to')))
              * 1000000 // len(toks) AS qscore
          FROM (SELECT doc_id, source, $sqlTokens AS toks FROM documents) q
          WHERE len(toks) > 0),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY qscore DESC, doc_id) AS rn,
            COUNT(*) OVER (PARTITION BY source) AS c
          FROM sc)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN rn*10 <= c*9 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_kept,
          CAST(MIN(CASE WHEN rn*10 <= c*9 THEN qscore END) AS BIGINT)
            AS decile_threshold,
          CAST(SUM(CASE WHEN rn*10 <= c*9 THEN nt ELSE 0 END) AS BIGINT)
            AS n_tokens_kept
        FROM rk GROUP BY source ORDER BY source""")),

    // Document fingerprint: md5 of whitespace-normalized lowercase text
    // (rolling-hash stand-in that both engines share bit-for-bit).
    QueryDef("t_fingerprint",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          ${sqlFingerprint("text")} AS fingerprint
        FROM documents ORDER BY doc_id""")),

    // Language profile: per-language corpus stats (exact ints).
    QueryDef("t_lang_profile",
      (s, dir) => t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          (CAST(SUM(n_chars) AS DOUBLE)/COUNT(*)) AS mean_chars
        FROM documents GROUP BY lang ORDER BY lang""")),

    // Heuristic language ID from text features alone (no `lang` input):
    // deterministic rule over stopword families. The point is the
    // pipeline shape — a codegen'd scoring expression — not linguistics.
    QueryDef("t_lang_id_heuristic",
      (s, dir) => t(s, dir, "documents")
        .withColumn("toks", tokens)
        .select(col("doc_id"),
          when(expr("size(filter(toks, w -> w IN ('the','of','and')))") > 2, "en")
            .when(expr("size(filter(toks, w -> w IN ('der','die','das','und')))") > 0, "de")
            .when(expr("size(filter(toks, w -> w IN ('el','la','de','que')))") > 0, "es")
            .otherwise("unknown").as("lang_guess"))
        .groupBy("lang_guess").agg(count(lit(1)).as("n"))
        .orderBy("lang_guess"),
      Some("""SELECT lang_guess, COUNT(*) AS n FROM (
          SELECT CASE
            WHEN len(list_filter(toks, w -> w IN ('the','of','and'))) > 2 THEN 'en'
            WHEN len(list_filter(toks, w -> w IN ('der','die','das','und'))) > 0 THEN 'de'
            WHEN len(list_filter(toks, w -> w IN ('el','la','de','que'))) > 0 THEN 'es'
            ELSE 'unknown' END AS lang_guess
          FROM (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
                FROM documents) t) q
        GROUP BY lang_guess ORDER BY lang_guess""")),

    // Multimodal plumbing: opaque binary column + typed metadata. The
    // bytes here are the utf8 text (the container has no image libs —
    // decode stays a stub, see graft.functions.Multimodal); the Spark
    // side of the pipeline (binary schema, length, prefix) is real.
    QueryDef("t_binary_meta",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text").cast("binary")).as("n_bytes"),
          hex(substring(col("text"), 1, 4).cast("binary")).as("magic"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
          upper(hex(encode(substring(text, 1, 4)))) AS magic
        FROM documents ORDER BY doc_id""")),

    // PII scrubbing pass: redact email-shaped tokens and long digit
    // runs, report per-language hit counts and the size delta — the
    // shape of a compliance pass over a training corpus (map-only,
    // codegen regex, no shuffle until the tiny per-lang rollup).
    QueryDef("t_redact_pii",
      (s, dir) => t(s, dir, "documents")
        .withColumn("red", regexp_replace(regexp_replace(col("text"),
          "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
          "[0-9]{4,}", "<NUM>"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("red") =!= col("text"), 1L).otherwise(0L))
            .as("n_redacted"),
          sum((length(col("text")) - length(col("red"))).cast("long"))
            .as("delta_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN red <> text THEN 1 ELSE 0 END) AS BIGINT)
            AS n_redacted,
          CAST(SUM(length(text) - length(red)) AS BIGINT) AS delta_chars
        FROM (SELECT lang, text,
            regexp_replace(regexp_replace(text,
              '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
              '[0-9]{4,}', '<NUM>', 'g') AS red
          FROM documents) q
        GROUP BY lang ORDER BY lang""")),

    // Repetition quality signals (the Gopher/MassiveText repetition
    // filters, Rae et al. 2021 §A1.1, adapted to token level): per doc
    // the top-1-gram count, top-2-gram count, and duplicate-token
    // count; rolled up per lang as exact integer sums with ONE double
    // division each at the end, so the oracle hashes bit-identically.
    // Everything per-doc is row-local array math over the token list
    // (native higher-order expressions, no UDF, no shuffle) — at
    // 100 TB this stage is map-only; the only shuffle is the per-lang
    // rollup, whose partial aggregation reduces each task to a handful
    // of rows. The repetitive-doc test multiplies instead of dividing
    // (top1*5 > n_tok ⇔ top word >20%) to stay in exact integers.
    QueryDef("t_rep_signals",
      (s, dir) => t(s, dir, "documents")
        .withColumn("toks", tokens)
        .withColumn("n_tok", size(col("toks")))
        .withColumn("n_dist", size(array_distinct(col("toks"))))
        .withColumn("top1", coalesce(array_max(expr(
          "transform(array_distinct(toks), w -> size(filter(toks, t -> t = w)))")),
          lit(0)))
        .withColumn("bigrams", when(col("n_tok") < 2,
          expr("array()").cast("array<string>"))
          .otherwise(expr("transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")))
        .withColumn("top2", coalesce(array_max(expr(
          "transform(array_distinct(bigrams), " +
            "w -> size(filter(bigrams, t -> t = w)))")), lit(0)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("sum_tok"),
          (sum(col("top1").cast("long")).cast("double")
            / sum(col("n_tok").cast("long")).cast("double")).as("top1_frac"),
          (sum(col("top2").cast("long")).cast("double")
            / sum(greatest(col("n_tok") - 1, lit(0)).cast("long"))
              .cast("double")).as("top2_frac"),
          ((sum(col("n_tok").cast("long")) - sum(col("n_dist").cast("long")))
            .cast("double")
            / sum(col("n_tok").cast("long")).cast("double")).as("dup_tok_frac"),
          sum(when(col("top1") * 5 > col("n_tok"), 1L).otherwise(0L))
            .as("n_repetitive"))
        .orderBy("lang"),
      Some(s"""WITH per_doc AS (
          SELECT lang, len(toks) AS n_tok,
            len(list_distinct(toks)) AS n_dist,
            COALESCE(list_max(list_transform(list_distinct(toks),
              w -> len(list_filter(toks, t -> t = w)))), 0) AS top1,
            COALESCE(list_max(list_transform(list_distinct(bigrams),
              w -> len(list_filter(bigrams, t -> t = w)))), 0) AS top2
          FROM (
            SELECT lang, toks,
              CASE WHEN len(toks) < 2 THEN []
                ELSE list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i + 1]) END AS bigrams
            FROM (SELECT lang, $sqlTokens AS toks FROM documents) a) b)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
          CAST(SUM(top1) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) AS top1_frac,
          CAST(SUM(top2) AS DOUBLE)
            / CAST(SUM(GREATEST(n_tok - 1, 0)) AS DOUBLE) AS top2_frac,
          CAST(SUM(n_tok) - SUM(n_dist) AS DOUBLE)
            / CAST(SUM(n_tok) AS DOUBLE) AS dup_tok_frac,
          CAST(SUM(CASE WHEN top1 * 5 > n_tok THEN 1 ELSE 0 END) AS BIGINT)
            AS n_repetitive
        FROM per_doc GROUP BY lang ORDER BY lang""")),

    // Mixture-weighted (stratified) sampling — the data-mixing step
    // that reweights sources toward a target distribution (the Pile /
    // DoReMi recipe): each source gets its own keep-rate, applied as a
    // deterministic md5 gate on doc_id, so the sample is reproducible
    // on any cluster size, re-run, or re-shard (the same property as
    // t_hash_sample, per stratum). Map-only: the per-source threshold
    // is a literal map lookup, no join, no global count; the rollup
    // shows kept vs total per source. Unlisted sources default to the
    // 75% gate.
    QueryDef("t_stratified_sample",
      (s, dir) => {
        val thresholds = Seq(
          "src0" -> "10", "src1" -> "20", "src2" -> "40", "src3" -> "80",
          "src4" -> "08", "src5" -> "ff")
        val mapArgs = thresholds.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
        t(s, dir, "documents")
          .withColumn("thr",
            coalesce(element_at(map(mapArgs: _*), col("source")), lit("c0")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            sum(when(substring(md5(col("doc_id").cast("string")), 1, 2)
              < col("thr"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy("source")
      },
      Some("""SELECT source, COUNT(*) AS n_total,
          CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
            CASE source
              WHEN 'src0' THEN '10' WHEN 'src1' THEN '20'
              WHEN 'src2' THEN '40' WHEN 'src3' THEN '80'
              WHEN 'src4' THEN '08' WHEN 'src5' THEN 'ff'
              ELSE 'c0' END
            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents GROUP BY source ORDER BY source""")),

    // Distinctive terms per source — TF-IDF's "what characterizes this
    // slice" analysis with a rational weight (term frequency in the
    // source / number of sources carrying the term) instead of a
    // transcendental idf, so the score is a single division of exact
    // integers and the DuckDB hash-compare stays bit-exact. Scale
    // shape: ONE token explode into the (source, term) partial-agg
    // shuffle; the cross-source document frequency is a WINDOW over
    // the term (vocabulary-sized input, no join back, no second scan),
    // and the per-source top-5 is a rank window — everything after the
    // first aggregate operates on vocab×sources rows, never on the
    // corpus.
    QueryDef("t_distinctive_terms",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tf = tBalanced(s, dir, "documents")
          .select(col("source"), explode(tokens).as("term"))
          .groupBy("source", "term").agg(count(lit(1)).as("tf"))
        val scored = tf
          .withColumn("n_sources",
            count(lit(1)).over(Window.partitionBy("term")))
          .withColumn("score",
            col("tf").cast("double") / col("n_sources"))
        scored
          .withColumn("rank", row_number().over(Window.partitionBy("source")
            .orderBy(col("score").desc, col("term"))))
          .filter(col("rank") <= 5)
          .select(col("source"), col("rank").cast("long").as("rank"),
            col("term"), col("tf"), col("n_sources"), col("score"))
          .orderBy("source", "rank")
      },
      Some(s"""WITH tf AS (
          SELECT source, term, COUNT(*) AS tf FROM (
            SELECT source, unnest($sqlTokens) AS term FROM documents) u
          GROUP BY source, term),
        sc AS (
          SELECT source, term, tf,
            COUNT(*) OVER (PARTITION BY term) AS n_sources,
            CAST(tf AS DOUBLE) / COUNT(*) OVER (PARTITION BY term) AS score
          FROM tf),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY score DESC, term) AS rank
          FROM sc)
        SELECT source, CAST(rank AS BIGINT) AS rank, term,
          CAST(tf AS BIGINT) AS tf, CAST(n_sources AS BIGINT) AS n_sources,
          score
        FROM rk WHERE rank <= 5 ORDER BY source, rank""")),

    // Trained language-ID with a held-out eval — the textcat-style
    // profile method closing its own loop (train → predict → confusion
    // matrix), the same shape as s_ivf_recall for ANN. Split: docs
    // with h60(doc_id) % 5 = 0 are the test fold, the rest train.
    // Train: per-language top-20 tokens by frequency (row_number with
    // a token tiebreak — fully deterministic). Predict: a test doc's
    // language = the profile sharing the most of its DISTINCT tokens
    // (overlap count, ties to the lexicographically first language;
    // zero overlap → 'unknown'). Integer counts end-to-end. Scale
    // shape: profiles are L×20 rows (broadcast); the candidate fold
    // shuffles on doc_id only — nothing wider.
    QueryDef("t_langid_eval",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = tBalanced(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            array_distinct(tokens).as("toks"),
            (pmod(h60s(col("doc_id")), lit(5L)) === 0L).as("is_test"))
        val profile = docs.filter(!col("is_test"))
          .select(col("lang").as("plang"), explode(col("toks")).as("tok"))
          .groupBy("plang", "tok").agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(Window.partitionBy("plang")
            .orderBy(col("cnt").desc, col("tok"))))
          .filter(col("rk") <= 20)
          .select("plang", "tok")
        // Predict WITHOUT the corpus-side left join the old shape paid
        // (both join inputs exchanged + sorted): every test doc
        // contributes one SENTINEL row (flag=1, plang NULL — the
        // sentinel branch never tokenizes, its scan prunes to
        // (doc_id, lang)) unioned with the profile-overlap rows, so
        // zero-overlap docs surface as 'unknown' inside the same
        // aggregate. One exchange keyed doc_id serves both aggregation
        // levels (hashpartitioning(doc_id) satisfies both clusterings),
        // and min_by over the (flag, -n_overlap, plang) struct replaces
        // the rank-1 window — no sort, same deterministic tie-break
        // (any real overlap beats the sentinel, then max overlap, then
        // lexicographically first language). `lang` rides along
        // (functionally dependent on doc_id), so the confusion matrix
        // needs no join back to the corpus (guide §2.4).
        val overlapRows = docs.filter(col("is_test"))
          .select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
          .join(broadcast(profile), Seq("tok"))
          .select(col("doc_id"), col("lang"), col("plang"),
            lit(0).as("flag"))
        val sentinelRows = docs.filter(col("is_test"))
          .select(col("doc_id"), col("lang"),
            lit(null).cast("string").as("plang"), lit(1).as("flag"))
        val pred = overlapRows.unionByName(sentinelRows)
          .repartition(col("doc_id"))
          .groupBy("doc_id", "lang", "plang", "flag")
          .agg(count(lit(1)).as("n_overlap"))
          .groupBy("doc_id", "lang")
          .agg(min_by(
            when(col("flag") === 1, lit("unknown")).otherwise(col("plang")),
            struct(col("flag"), (-col("n_overlap")).as("neg"),
              col("plang"))).as("lang_pred"))
        pred.groupBy("lang", "lang_pred").agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "lang_pred")
      },
      Some(s"""WITH d AS (
          SELECT doc_id, lang,
            list_distinct($sqlTokens) AS toks,
            ${sqlH60s("CAST(doc_id AS VARCHAR)")} % 5 = 0 AS is_test
          FROM documents),
        pf AS (
          SELECT plang, tok FROM (
            SELECT lang AS plang, tok, COUNT(*) AS cnt,
              ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY COUNT(*) DESC, tok) AS rk
            FROM (SELECT lang, unnest(toks) AS tok FROM d WHERE NOT is_test) u
            GROUP BY lang, tok) q
          WHERE rk <= 20),
        ov AS (
          SELECT doc_id, plang, COUNT(*) AS n_overlap
          FROM (SELECT doc_id, unnest(toks) AS tok FROM d WHERE is_test) u
          JOIN pf USING (tok)
          GROUP BY doc_id, plang),
        pr AS (
          SELECT doc_id, plang AS lang_pred FROM (
            SELECT doc_id, plang, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY n_overlap DESC, plang) AS rk
            FROM ov) q
          WHERE rk = 1)
        SELECT d.lang, COALESCE(pr.lang_pred, 'unknown') AS lang_pred,
          COUNT(*) AS n_docs
        FROM d LEFT JOIN pr USING (doc_id)
        WHERE d.is_test
        GROUP BY d.lang, COALESCE(pr.lang_pred, 'unknown')
        ORDER BY lang, lang_pred""")),

    // BM25 keyword retrieval: top-20 docs for a fixed query-term set —
    // the retrieval primitive behind decontamination lookups and
    // quality-targeted corpus search. Engine-portable by construction:
    // k1 = 1.2 = 6/5 and b = 0.75 = 3/4 clear to the integer form
    //   tf_factor = 44·tf·avgdl / (20·tf·avgdl + 6·avgdl + 18·dl)
    // (multiply through by 20·avgdl), quantized to milli-units in ONE
    // integer division; the IDF is the rational surrogate
    // (N-df)·1000 // (df+1) (same device as t_distinctive_terms), so
    // the score is a BIGINT both engines derive bit-identically.
    // Scale: per-term tf comes from array filters MAP-SIDE (no explode,
    // no corpus-wide (doc, word) shuffle); the corpus-level stats are
    // ONE 1-row aggregate broadcast back; the only other exchange is
    // the final top-20 TakeOrdered. Milli-scaled factors keep every
    // product under 2^63 at any corpus size (idf ≤ N·1000, factor ≤
    // 2200 milli).
    QueryDef("t_bm25_topk",
      (s, dir) => {
        val terms = Seq("dup", "stream", "vector", "window")
        val base = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), tokens.as("toks"))
        val perDoc = base.select(
          (col("doc_id") +: size(col("toks")).as("dl") +:
            terms.map(tm => size(filter(col("toks"),
              w => w === lit(tm))).as(s"tf_$tm"))): _*)
        val statCols = count(lit(1)).as("n") +: sum(col("dl")).as("total") +:
          terms.map(tm => sum(when(col(s"tf_$tm") > 0, 1L).otherwise(0L))
            .as(s"df_$tm"))
        val stats = perDoc.agg(statCols.head, statCols.tail: _*)
        val termScore = terms.map { tm =>
          s"""CASE WHEN tf_$tm > 0 THEN
              (((n - df_$tm) * 1000) div (df_$tm + 1)) *
              ((tf_$tm * 44 * (total div n) * 1000) div
               (20 * tf_$tm * (total div n) + 6 * (total div n) + 18 * dl))
            ELSE 0L END"""
        }.mkString("(", " + ", ")")
        perDoc.crossJoin(broadcast(stats))
          .select(col("doc_id"), expr(termScore).as("score_micro"))
          .filter(col("score_micro") > 0)
          .orderBy(col("score_micro").desc, col("doc_id"))
          .limit(20)
      },
      Some {
        val terms = Seq("dup", "stream", "vector", "window")
        val tfs = terms.map(tm =>
          s"len(list_filter(toks, w -> w = '$tm')) AS tf_$tm").mkString(", ")
        val dfs = terms.map(tm =>
          s"CAST(SUM(CASE WHEN tf_$tm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$tm")
          .mkString(", ")
        val score = terms.map { tm =>
          s"""CASE WHEN tf_$tm > 0 THEN
              (((n - df_$tm) * 1000) // (df_$tm + 1)) *
              ((tf_$tm * 44 * (total // n) * 1000) //
               (20 * tf_$tm * (total // n) + 6 * (total // n) + 18 * dl))
            ELSE 0 END"""
        }.mkString("(", " + ", ")")
        s"""WITH d AS (
            SELECT doc_id, $sqlTokens AS toks FROM documents
            WHERE text IS NOT NULL),
          p AS (
            SELECT doc_id, len(toks) AS dl, $tfs FROM d),
          st AS (
            SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS total, $dfs
            FROM p)
          SELECT doc_id, CAST($score AS BIGINT) AS score_micro
          FROM p, st
          WHERE $score > 0
          ORDER BY score_micro DESC, doc_id LIMIT 20"""
      }),

    // DSIR-style importance selection (Xie et al.: data selection by
    // importance resampling): score every document by how much more
    // likely its hashed n-gram features are under a TARGET distribution
    // (here the lang='en' slice) than under the raw corpus, then keep
    // the target-like docs. Features are md5-bucketed word unigrams
    // (64 buckets, add-one smoothed); the log-likelihood ratio uses
    // the integer floor(log2) both engines compute identically as
    // `length(bin(x))` — the HLL rank trick — as SUMS of per-count
    // logs (never a log of products, so nothing overflows at any
    // corpus size). 100 TB shape: both bucket tables are 64 rows
    // (broadcast); the per-doc score is one explode + broadcast join +
    // map-side-combined sum — no corpus-wide window, no pair join.
    QueryDef("t_dsir_select",
      (s, dir) => {
        val B = 64
        val docs = t(s, dir, "documents")
        val toks = docs
          .select(col("doc_id"), col("lang"), explode(tokens).as("w"))
          .withColumn("b", h60s(col("w")) % B)
        // target and raw bucket counts in ONE corpus pass (conditional
        // aggregation) — separate tgt/raw aggregates would tokenize
        // the corpus twice, since Spark does not dedupe common
        // subplans
        val counts = toks.groupBy("b").agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
          count(lit(1)).as("nr"))
        // 64-bucket spine so add-one smoothing covers empty buckets
        // identically in both engines
        val spine = s.range(B).select(col("id").as("b"))
        val wtab = spine
          .join(counts, Seq("b"), "left")
          .select(col("b"),
            (coalesce(col("nt"), lit(0L)) + 1L).as("nt1"),
            (coalesce(col("nr"), lit(0L)) + 1L).as("nr1"))
        val totals = wtab.agg(sum("nt1").as("ttot"), sum("nr1").as("rtot"))
        val weights = wtab.crossJoin(broadcast(totals))
          .select(col("b"),
            // log2(nt1/ttot) - log2(nr1/rtot), floor-log2 per term
            (expr("length(bin(nt1)) - length(bin(nr1))") +
              expr("length(bin(rtot)) - length(bin(ttot))"))
              .cast("long").as("wgt"))
        // the per-lang rollup aggregates the SCORED (token-bearing)
        // docs straight down to L rows and joins the tiny per-lang doc
        // count — NOT a doc_id join back to the corpus (the first cut
        // did, and the plan showed a corpus-wide sort-merge join that
        // a 100 TB table cannot afford); token-less docs count in
        // n_docs and nothing else
        val perDoc = toks
          .join(broadcast(weights), Seq("b"))
          .groupBy("doc_id", "lang").agg(sum("wgt").as("weight"))
        val scored = perDoc.groupBy("lang")
          .agg(sum(when(col("weight") > 0L, 1L).otherwise(0L))
            .as("n_selected"),
            sum("weight").as("sum_weight"),
            max("weight").as("max_weight"))
        docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .join(broadcast(scored), Seq("lang"), "left")
          .select(col("lang"), col("n_docs"),
            coalesce(col("n_selected"), lit(0L)).as("n_selected"),
            coalesce(col("sum_weight"), lit(0L)).as("sum_weight"),
            coalesce(col("max_weight"), lit(0L)).as("max_weight"))
          .orderBy("lang")
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, lang, unnest($sqlTokens) AS w FROM documents),
        tb AS (
          SELECT doc_id, lang, ${sqlH60s("w")} % 64 AS b FROM toks),
        bcounts AS (
          SELECT b,
            CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS nt,
            COUNT(*) AS nr
          FROM tb GROUP BY 1),
        spine AS (SELECT unnest(range(0, 64)) AS b),
        wtab AS (
          SELECT spine.b,
            COALESCE(nt, 0) + 1 AS nt1, COALESCE(nr, 0) + 1 AS nr1
          FROM spine LEFT JOIN bcounts ON spine.b = bcounts.b),
        totals AS (
          SELECT CAST(SUM(nt1) AS BIGINT) AS ttot,
            CAST(SUM(nr1) AS BIGINT) AS rtot FROM wtab),
        weights AS (
          SELECT b, CAST(length(bin(nt1)) - length(bin(nr1))
            + length(bin(rtot)) - length(bin(ttot)) AS BIGINT) AS wgt
          FROM wtab, totals),
        per_doc AS (
          SELECT tb.doc_id, tb.lang, CAST(SUM(wgt) AS BIGINT) AS weight
          FROM tb JOIN weights ON tb.b = weights.b GROUP BY 1, 2),
        scored AS (
          SELECT lang,
            CAST(SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_selected,
            CAST(SUM(weight) AS BIGINT) AS sum_weight,
            CAST(MAX(weight) AS BIGINT) AS max_weight
          FROM per_doc GROUP BY 1),
        counts AS (
          SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1)
        SELECT counts.lang, n_docs,
          COALESCE(n_selected, 0) AS n_selected,
          COALESCE(sum_weight, 0) AS sum_weight,
          COALESCE(max_weight, 0) AS max_weight
        FROM counts LEFT JOIN scored ON counts.lang = scored.lang
        ORDER BY 1"""))
  )
}
