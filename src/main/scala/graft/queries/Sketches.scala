package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import Tables._

/** Engine-portable probabilistic sketches — THE profiling tools a
  * 100 TB pipeline runs where exact answers would shuffle the corpus:
  * HyperLogLog cardinality (one 64-register aggregate per group) and
  * Count-Min heavy-hitter estimation (a d×w counter table that
  * broadcasts). Both are built on the md5-derived [[Tables.h60]]
  * hashes, so — unlike Spark's native `approx_count_distinct` /
  * `count_min_sketch`, whose xxhash/murmur internals DuckDB cannot
  * replay — every register value here is bit-reproducible in the
  * oracle, and the single terminal division runs over deterministic
  * integer operands (the [[Tables]] determinism discipline).
  */
object Sketches {

  /** HLL geometry: m = 64 registers (6 bucket bits off the top of the
    * 60-bit hash, 54 rank bits below). Registers hold
    * rho = 1 + leading-zeros of the rank bits (1..55); the raw
    * estimate is alpha_m * m^2 / sum(2^-rho_j). Scaling every term by
    * 2^55 keeps the register sum an exact BIGINT (64 terms <= 2^55
    * each), leaving alphaM2Scaled / S as the one floating-point op.
    *
    * No small-range (linear-counting) branch ON PURPOSE: it needs
    * `ln`, which libm implementations round differently at the ulp —
    * the raw estimator is a division of deterministic operands, so the
    * oracle replays it bit-for-bit. At the cardinalities profiling
    * targets (every register occupied) the correction is inactive
    * anyway; the ~1.04/sqrt(64) ≈ 13% relative error is the m = 64
    * trade-off, sized small here so the whole register table stays
    * readable in the output of a demo corpus.
    */
  private val HllM = 64
  private val HllBucketDiv = 1L << 54
  private val hllAlpha = 0.7213 / (1 + 1.079 / HllM)
  private val hllC = hllAlpha * HllM * HllM * math.pow(2.0, 55).toLong
  // shortest round-trip decimal: DuckDB parses it back to the same double
  private val hllCLit = java.lang.Double.toString(hllC)

  /** Per-group HLL register table of `keyCol` in `df`: one row per
    * (groupCols, bucket) with the register value `mj`. THE single copy
    * of the bucket/rank derivation — both HLL queries and both their
    * oracles derive from here ([[sqlHllRegisterCtes]]), so the
    * integer-div determinism rule cannot drift between copies.
    */
  private def hllRegisters(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      keyCol: Column): org.apache.spark.sql.DataFrame =
    df.select(groupCols.map(col) :+ h60s(keyCol).as("h"): _*)
      .select(groupCols.map(col) ++ Seq(
        // integer div, NOT `/` (double division: a 53-bit mantissa can
        // round a hash near a multiple of 2^54 across the bucket
        // boundary; the oracle's `//` is exact)
        expr(s"h div $HllBucketDiv").as("bucket"),
        (col("h") % HllBucketDiv).as("w")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(when(col("w") === 0L, 55)
        .otherwise(lit(55) - length(bin(col("w"))))).as("mj"))

  /** The scaled-integer register sum: callers aggregate `mj` rows per
    * group and divide [[hllC]] by the result.
    */
  private def hllRegisterSum: Column =
    (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mj AS INT))"))
      + (lit(HllM.toLong) - count(lit(1))) * (1L << 55)).as("sreg")

  /** The same register derivation as DuckDB CTEs `h`/`b`/`m` over
    * `events` (event_type, user_id) — shared by both HLL oracles.
    */
  private val sqlHllRegisterCtes: String =
    s"""h AS (
          SELECT event_type, user_id,
            ${sqlH60s("CAST(user_id AS VARCHAR)")} AS h
          FROM events),
        b AS (
          SELECT event_type, h // ${HllBucketDiv} AS bucket,
            h % ${HllBucketDiv} AS w
          FROM h),
        m AS (
          SELECT event_type, bucket,
            MAX(CASE WHEN w = 0 THEN 55
                ELSE 55 - length(bin(w)) END) AS mj
          FROM b GROUP BY 1, 2)"""

  /** CMS geometry: d = 4 hash rows × w = 64 columns — 256 BIGINT
    * counters, broadcastable at any corpus size; estimates
    * overcount by at most the collision mass of the lightest row
    * (classic CMS guarantee), never undercount.
    */
  private val CmsD = 4
  private val CmsW = 64L

  /** The d per-seed CMS cells of a key column as one exploded array —
    * shared by the build (all rows) and probe (top-k rows) sides.
    */
  private def cmsCells(key: Column): Column =
    explode(array((0 until CmsD).map(r =>
      struct(lit(r).as("r"), (h60(key, r) % CmsW).as("c"))): _*))

  /** Quantile-sketch geometry: an HDR-style log-bucketed histogram
    * over positive BIGINT values. A value keeps its top QK+1
    * significant bits; the bucket id packs (shift, kept bits) so ids
    * are monotone in the value and every bucket's width is at most
    * 2^-QK of its lower bound — a guaranteed <1% relative error at
    * QK = 7 with at most ~2^QK buckets per octave (KB-scale total for
    * any 64-bit domain). Everything is integer bit arithmetic
    * (`length(bin(v))` is floor(log2)+1 in BOTH engines — the HLL
    * rank derivation already pins that), so the oracle replays the
    * sketch bit-for-bit. Unlike exact percentiles (a full sort at
    * 100 TB), the histogram is ONE map-side-combined aggregate, and
    * — the property this family exists to demonstrate — per-source
    * histograms MERGE by plain per-bucket count addition into exactly
    * the histogram of the union, no rescan.
    */
  private[graft] val QK = 7
  private[graft] val QM = 1 << (QK + 1) // bucket-id low-part modulus (256)

  /** Spark-SQL bucket id of positive BIGINT column `v`.
    * `private[graft]`: SketchesSpec's full-domain property test MUST
    * exercise THIS definition, not its own copy of the formula.
    */
  private[graft] def qBucketSpark(v: String): String =
    s"(greatest(length(bin($v)) - 1 - $QK, 0) * $QM + " +
      s"shiftright($v, greatest(length(bin($v)) - 1 - $QK, 0)))"

  /** The same bucket id in DuckDB (`>>` for shiftright, `//` for div). */
  private def qBucketSql(v: String): String =
    s"(greatest(length(bin($v)) - 1 - $QK, 0) * $QM + " +
      s"(($v) >> CAST(greatest(length(bin($v)) - 1 - $QK, 0) AS INT)))"

  /** Lower bound of bucket id `b` — the quantile estimate. */
  private[graft] def qLowerSpark(b: String): String =
    s"shiftleft($b % $QM, CAST($b div $QM AS INT))"
  private def qLowerSql(b: String): String =
    s"(($b % $QM) << CAST(($b // $QM) AS INT))"

  /** Bloom geometry: m = 4096 bit positions × k = 4 md5-kernel hashes.
    * The filter is materialized as its SET of set positions (<= 4096
    * rows, broadcastable at any corpus size) rather than packed words —
    * the set IS the sketch, unions are plain DISTINCT-unions (exact,
    * like the quantile histogram's count-addition), and both engines
    * derive every position from the same [[Tables.h60]] integers, so
    * membership answers replay bit-for-bit. Classic one-sided
    * guarantee: a member's positions are all present by construction
    * (no false negatives); non-members answer yes only on full k-way
    * collision. Sizing rule (standard Bloom math): ~10 bits per
    * expected member for ~1% false positives — production picks m from
    * the member-count estimate (the HLL row's output, fittingly). The
    * demo's fixed m = 4096 with the %10 member slice sits in that
    * regime through sf0.1 (the tested range); at larger corpora the
    * filter saturates gracefully (false-positive rate rises, the
    * no-false-negative and lossless-union contracts are unconditional
    * and the oracle equality holds at ANY fill) — a production build
    * would simply raise m.
    */
  private val BloomM = 4096L
  private val BloomK = 4

  /** The k bit positions of a key, one row each. */
  private def bloomPos(key: Column): Column =
    explode(array((0 until BloomK).map(r => h60(key, r) % BloomM): _*))

  private def sqlBloomPos(e: String): String =
    (0 until BloomK).map(r => s"${sqlH60(e, r)} % $BloomM")
      .mkString("unnest([", ", ", "])")

  /** Ceil-rank of percentile p over n rows, exact integer math. */
  private def qRankSpark(n: String, p: String): String =
    s"(($n * $p + 99) div 100)"
  private def qRankSql(n: String, p: String): String =
    s"(($n * $p + 99) // 100)"

  /** Columns the one-pass profiler sweeps: integer/string/date only —
    * their VARCHAR renderings are identical in Spark and DuckDB
    * (integers verbatim, dates ISO-8601; doubles can diverge at
    * scientific-notation thresholds, so they stay out of the
    * hash-profiled set).
    */
  private val ProfileCols = Seq("l_returnflag", "l_linestatus",
    "l_shipdate", "l_orderkey", "l_suppkey", "l_linenumber")

  val defs: Seq[QueryDef] = Seq(
    // ONE-PASS column profiler — the first thing a pipeline runs on a
    // new corpus: per-column row/null counts, exact distinct (the eval
    // readout), and the HLL estimate, all fed by a single scan that
    // unpivots the profiled columns into (col_name, value) rows. At
    // 100 TB the exact-distinct column drops and the remaining plan is
    // one map-side-combined pass over the corpus producing a KB-scale
    // register table for EVERY column at once — versus one
    // COUNT(DISTINCT) shuffle per column.
    QueryDef("q_profile_columns",
      (s, dir) => {
        val n = ProfileCols.length
        val stacked = t(s, dir, "lineitem").select(expr(
          s"stack($n, " + ProfileCols.map(c =>
            s"'$c', CAST($c AS STRING)").mkString(", ") +
            ") AS (col_name, value)"))
        val counts = stacked.groupBy("col_name").agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct("value").as("n_distinct"))
        val est = hllRegisters(stacked.filter(col("value").isNotNull),
            Seq("col_name"), col("value"))
          .groupBy("col_name").agg(hllRegisterSum)
          .select(col("col_name"), (lit(hllC) / col("sreg")).as("distinct_est"))
        // LEFT join: an all-null column yields no HLL register rows at
        // all — an inner join would silently drop it from the profile
        counts.join(est, Seq("col_name"), "left")
          .select("col_name", "n_rows", "n_nulls", "n_distinct",
            "distinct_est")
          .orderBy("col_name")
      },
      Some {
        val st = ProfileCols.map(c =>
          s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value " +
            "FROM lineitem").mkString(" UNION ALL ")
        s"""WITH st AS ($st),
          counts AS (
            SELECT col_name, COUNT(*) AS n_rows,
              CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nulls,
              COUNT(DISTINCT value) AS n_distinct
            FROM st GROUP BY 1),
          h AS (
            SELECT col_name, ${sqlH60s("value")} AS h
            FROM st WHERE value IS NOT NULL),
          b AS (
            SELECT col_name, h // $HllBucketDiv AS bucket,
              h % $HllBucketDiv AS w
            FROM h),
          m AS (
            SELECT col_name, bucket,
              MAX(CASE WHEN w = 0 THEN 55
                  ELSE 55 - length(bin(w)) END) AS mj
            FROM b GROUP BY 1, 2),
          sr AS (
            SELECT col_name,
              CAST(SUM(1::BIGINT << (55 - mj))
                + ($HllM - COUNT(*)) * (1::BIGINT << 55) AS BIGINT) AS sreg
            FROM m GROUP BY 1)
          SELECT col_name, n_rows, n_nulls, n_distinct,
            $hllCLit / sreg AS distinct_est
          FROM counts LEFT JOIN sr USING (col_name) ORDER BY col_name"""
      }),
    // Distinct users per event type, exact vs HLL: ONE pass builds all
    // per-(type, bucket) registers — map-side partial max, 64 rows per
    // group after the shuffle — where COUNT(DISTINCT) shuffles every
    // distinct (type, user) pair. At 100 TB the register table for
    // thousands of groups is still KB-scale; this is why every
    // warehouse profiles cardinality with HLL.
    QueryDef("q_hll_distinct_users",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("user_id"))
        val regs = hllRegisters(ev, Seq("event_type"), col("user_id"))
        val sreg = regs.groupBy("event_type").agg(hllRegisterSum)
        val exact = ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_exact"))
        exact.join(sreg, Seq("event_type"))
          .select(col("event_type"), col("n_exact"),
            (lit(hllC) / col("sreg")).as("hll_est"))
          .orderBy("event_type")
      },
      Some(s"""WITH $sqlHllRegisterCtes,
        s AS (
          SELECT event_type,
            CAST(SUM(1::BIGINT << (55 - mj))
              + ($HllM - COUNT(*)) * (1::BIGINT << 55) AS BIGINT) AS sreg
          FROM m GROUP BY 1),
        e AS (
          SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
          FROM events GROUP BY 1)
        SELECT event_type, n_exact, $hllCLit / sreg AS hll_est
        FROM e JOIN s USING (event_type) ORDER BY event_type""")),

    // MERGE the per-type HLL sketches into the union estimate — the
    // property that makes sketches the 100 TB profiling tool: a
    // register table built per partition/day/source merges by plain
    // per-bucket MAX into the sketch of the union, no rescan (exact
    // distinct counts cannot merge). The merged estimate is checked
    // against the exact global distinct; same deterministic
    // integer-register + single-division discipline as
    // q_hll_distinct_users.
    QueryDef("q_hll_union",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("user_id"))
        val perType = hllRegisters(ev, Seq("event_type"), col("user_id"))
        val merged = perType.groupBy("bucket").agg(max("mj").as("mj"))
        val sreg = merged.agg(hllRegisterSum)
        val exact = ev.agg(
          countDistinct(col("user_id")).as("n_exact_union"),
          countDistinct(col("event_type")).as("n_sketches_merged"))
        exact.crossJoin(sreg)
          .select(col("n_sketches_merged"), col("n_exact_union"),
            (lit(hllC) / col("sreg")).as("hll_union_est"))
      },
      Some(s"""WITH $sqlHllRegisterCtes,
        mg AS (SELECT bucket, MAX(mj) AS mj FROM m GROUP BY 1),
        s AS (
          SELECT CAST(SUM(1::BIGINT << (55 - mj))
            + ($HllM - COUNT(*)) * (1::BIGINT << 55) AS BIGINT) AS sreg
          FROM mg),
        e AS (
          SELECT COUNT(DISTINCT user_id) AS n_exact_union,
            COUNT(DISTINCT event_type) AS n_sketches_merged
          FROM events)
        SELECT n_sketches_merged, n_exact_union,
          $hllCLit / sreg AS hll_union_est
        FROM e, s""")),

    // Heavy hitters, exact vs Count-Min: the 256-counter table is a
    // single aggregate (map-side combine collapses each partition to
    // <= d*w rows before ONE tiny shuffle) and then broadcasts to
    // score any probe set — at 100 TB the sketch is what you keep
    // PER HOUR to answer "is this key hot" without re-scanning. The
    // probe set here is the exact top-10 (so the row also verifies
    // the CMS >= exact one-sided error bound on real data); estimates
    // are integer minima of integer counters — bit-exact in DuckDB.
    QueryDef("q_cms_heavy_hitters",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"))
        val cells = ev
          .select(cmsCells(col("user_id")).as("e"))
          .groupBy(col("e.r").as("r"), col("e.c").as("c"))
          .agg(count(lit(1)).as("n"))
        val top = ev.groupBy("user_id")
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("user_id")).limit(10)
        top
          .select(col("user_id"), col("n_exact"),
            cmsCells(col("user_id")).as("e"))
          .select(col("user_id"), col("n_exact"),
            col("e.r").as("r"), col("e.c").as("c"))
          .join(broadcast(cells), Seq("r", "c"))
          .groupBy("user_id", "n_exact")
          .agg(min("n").as("n_cms_est"))
          .orderBy(col("n_exact").desc, col("user_id"))
      },
      Some {
        val probes = (0 until CmsD).map(r =>
          s"SELECT user_id, n_exact, $r AS r, " +
            s"${sqlH60("CAST(user_id AS VARCHAR)", r)} % $CmsW AS c FROM ex")
          .mkString(" UNION ALL ")
        val raws = (0 until CmsD).map(r =>
          s"SELECT $r AS r, " +
            s"${sqlH60("CAST(user_id AS VARCHAR)", r)} % $CmsW AS c " +
            "FROM events")
          .mkString(" UNION ALL ")
        s"""WITH cl AS (
            SELECT r, c, COUNT(*) AS n FROM ($raws) q GROUP BY 1, 2),
          ex AS (
            SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY 1
            ORDER BY n_exact DESC, user_id LIMIT 10),
          pr AS ($probes)
          SELECT user_id, n_exact, CAST(MIN(n) AS BIGINT) AS n_cms_est
          FROM pr JOIN cl USING (r, c)
          GROUP BY 1, 2 ORDER BY n_exact DESC, user_id"""
      }),

    // p50/p90/p99 of lineitem price (cents) from the log-bucketed
    // histogram, next to the exact ceil-rank order statistic: ONE
    // map-side-combined aggregate builds the value-count table; the
    // KB-scale histogram rolls up from it, a window over the
    // <=few-thousand-bucket table finds the ceil-rank bucket, and its
    // lower bound is the estimate — guaranteed within 2^-7 < 1% below
    // the true order statistic, which the readout column computes from
    // the same value counts (a distinct-values window — the EVAL
    // baseline; the sketch itself never needs it, and at 100 TB you'd
    // drop the readout and keep the bounded histogram path). All
    // integer bit math, shared with the oracle.
    QueryDef("q_quantile_sketch",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Sketch: one map-side-combined aggregate → KB-scale histogram;
        // a window over it finds the ceil-rank bucket. Exact readout:
        // sketch-guided REFINEMENT — a second scan filtered to the 3
        // crossing buckets (range filters, pushdown-friendly), then a
        // per-p value-count window bounded by the bucket's VALUE RANGE
        // (<= 2^-7 of its lower bound — independent of corpus size),
        // picking the (rank − rows-below-bucket)-th value inside. The
        // exact column is itself 100 TB-shaped: no corpus-wide distinct
        // window, no percentile value map. `hist` is consumed by three
        // subtrees but NOT persisted: the recompute is one codegen'd
        // scan+agg, cheaper than the cache round-trip (sf0.1
        // QueryTimer: 6.8 s cold / 1.1 s warm vs 7.9 / 1.3 persisted —
        // the q_quantile_union measurement, same shape).
        val li = t(s, dir, "lineitem")
          .select(cents(col("l_extendedprice")).as("v"))
        // The histogram is BOUNDED (≤ 64 × 256 log-buckets regardless
        // of corpus size — the sketch's whole point), so collect it
        // once and fold cum/totals/rank/crossing-bucket on the DRIVER
        // with the same integer math, instead of re-deriving them
        // through a ~12-stage chain of windows and self-joins whose
        // every hop re-planned the KB-scale frame (the plan referenced
        // the un-persisted `hist` subtree 4×, re-scanning lineitem each
        // time — guide §2.4, §5 "bounded final outputs"). One scan
        // builds the histogram; the only other corpus pass left is the
        // exact-readout refinement below. Measured 3.1 s → ~1.1 s warm
        // at sf0.1.
        val histRows = li.select(expr(qBucketSpark("v")).as("b"))
          .groupBy("b").agg(count(lit(1)).as("n"))
          .orderBy("b").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val nTotal = histRows.map(_._2).sum
        val nBuckets = histRows.length.toLong
        // per p: ceil-rank, crossing bucket (min b with cum >= rank),
        // rows strictly below it, bucket lower bound + width shift —
        // bit-identical to qRankSpark/qLowerSpark's integer formulas
        val crRows = if (nBuckets == 0) Seq.empty[
          (Long, Long, Long, Long, Long, Long, Int)]
        else Seq(50L, 90L, 99L).map { p =>
          val rank = (nTotal * p + 99L) / 100L
          var cum = 0L
          var i = 0
          while (i < histRows.length && cum + histRows(i)._2 < rank) {
            cum += histRows(i)._2; i += 1
          }
          val bq = histRows(i)._1
          val est = (bq % QM) << (bq / QM)
          (p, rank, nTotal, nBuckets, cum, est, (bq / QM).toInt)
        }
        locally {
          import s.implicits._
          val cr = crRows
            .toDF("p", "rank", "n_total", "n_buckets", "below",
              "est_cents", "shift")
          // exact readout unchanged: sketch-guided refinement — one
          // scan filtered to the 3 crossing buckets (range filters,
          // pushdown-friendly), per-p value-count window bounded by the
          // bucket's VALUE RANGE, pick the (rank − below)-th value
          val exact = li
            .join(broadcast(cr), col("v") >= col("est_cents") &&
              col("v") - col("est_cents") < expr("shiftleft(1L, shift)"))
            .groupBy("p", "rank", "below", "n_total", "n_buckets",
              "est_cents", "v")
            .agg(count(lit(1)).as("nv"))
            .withColumn("cumv",
              sum("nv").over(Window.partitionBy("p").orderBy("v")))
            .filter(col("below") + col("cumv") >= col("rank"))
            .groupBy("p", "n_total", "n_buckets", "est_cents")
            .agg(min("v").as("exact_cents"))
          exact
            .select("p", "n_total", "n_buckets", "exact_cents", "est_cents")
            .orderBy("p")
        }
      },
      Some {
        val vcents = sqlCents("l_extendedprice")
        s"""WITH vc AS (
            SELECT $vcents AS v, COUNT(*) AS nv FROM lineitem GROUP BY 1),
          hist AS (
            SELECT ${qBucketSql("v")} AS b, CAST(SUM(nv) AS BIGINT) AS n
            FROM vc GROUP BY 1),
          cm AS (
            SELECT b, SUM(n) OVER (ORDER BY b) AS cum FROM hist),
          totals AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_total,
              COUNT(*) AS n_buckets FROM hist),
          vcum AS (
            SELECT v, SUM(nv) OVER (ORDER BY v) AS cumv FROM vc),
          ps AS (SELECT * FROM (VALUES (50), (90), (99)) AS t(p)),
          ranked AS (
            SELECT p, n_total, n_buckets,
              ${qRankSql("n_total", "p")} AS rank
            FROM ps, totals),
          exact AS (
            SELECT p, n_total, n_buckets, MIN(v) AS exact_cents
            FROM ranked JOIN vcum ON cumv >= rank
            GROUP BY 1, 2, 3),
          est AS (
            SELECT p, MIN(b) AS bq
            FROM ranked JOIN cm ON cum >= rank GROUP BY 1)
          SELECT CAST(p AS BIGINT) AS p, n_total, n_buckets, exact_cents,
            CAST(${qLowerSql("bq")} AS BIGINT) AS est_cents
          FROM exact JOIN est USING (p) ORDER BY p"""
      }),

    // MERGE per-returnflag histograms into the union sketch — the
    // q_hll_union counterpart, but for quantiles the merge is LOSSLESS:
    // per-bucket count addition reproduces the union's histogram
    // exactly, so the merged estimate EQUALS the directly-built one
    // (both computed, both emitted — the row is the proof). At 100 TB
    // this is the shape that matters: per-source/day sketches roll up
    // into corpus quantiles with no rescan.
    QueryDef("q_quantile_union",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            cents(col("l_extendedprice")).as("v"))
        // NOT persisted although two subtrees consume it: the
        // recompute is one codegen'd scan+agg, cheaper than the cache
        // round-trip (sf0.1 QueryTimer: no-persist 7.4 s cold / 1.0 s
        // warm vs MEMORY_AND_DISK persist 10.1 s / 1.5 s)
        // Two INDEPENDENT one-pass scans stay (per-flag sketches vs the
        // directly-built union — computing both is the row's
        // losslessness proof), but each histogram is BOUNDED (flags ×
        // ≤64×256 buckets), so the cum/rank/crossing-bucket derivation
        // folds on the DRIVER over the collected rows instead of a
        // window + self-join chain per side (same rewrite + rationale
        // as q_quantile_sketch above; ~8 exchanges removed).
        // ONE action for both scans (a NULL flag tags the direct side):
        // two sequential collects would serialize the scans, a union
        // lets Spark run both branches of the same job concurrently
        val allRows = li
          .select(col("l_returnflag"), expr(qBucketSpark("v")).as("b"))
          .groupBy("l_returnflag", "b").agg(count(lit(1)).as("n"))
          .unionByName(li
            .select(lit(null).cast("string").as("l_returnflag"),
              expr(qBucketSpark("v")).as("b"))
            .groupBy("l_returnflag", "b").agg(count(lit(1)).as("n")))
          .collect()
          .map(r => (if (r.isNullAt(0)) null else r.getString(0),
            r.getLong(1), r.getLong(2)))
        val perFlagRows = allRows.filter(_._1 != null)
        val directRows = allRows.filter(_._1 == null)
          .map(t3 => (t3._2, t3._3))
        val mergedRows = perFlagRows.groupBy(_._2).view
          .mapValues(_.map(_._3).sum).toArray.sortBy(_._1)
        // bit-identical to qRankSpark/qLowerSpark's integer formulas
        def estOf(hist: Array[(Long, Long)]): Seq[(Long, Long)] = {
          val nTotal = hist.map(_._2).sum
          if (nTotal == 0) return Seq.empty
          Seq(50L, 90L, 99L).map { p =>
            val rank = (nTotal * p + 99L) / 100L
            var cum = 0L
            var i = 0
            while (i < hist.length && cum + hist(i)._2 < rank) {
              cum += hist(i)._2; i += 1
            }
            val bq = hist(i)._1
            p -> ((bq % QM) << (bq / QM))
          }
        }
        val nMerged = perFlagRows.map(_._1).distinct.length.toLong
        val dEst = estOf(directRows.sortBy(_._1)).toMap
        import s.implicits._
        estOf(mergedRows)
          .map { case (p, m) => (p, nMerged, m, dEst(p)) }
          .toDF("p", "n_sketches_merged", "est_merged_cents",
            "est_direct_cents")
          .orderBy("p")
      },
      Some {
        val vc = sqlCents("l_extendedprice")
        s"""WITH li AS (
            SELECT l_returnflag, $vc AS v FROM lineitem),
          pf AS (
            SELECT l_returnflag, ${qBucketSql("v")} AS b, COUNT(*) AS n
            FROM li GROUP BY 1, 2),
          merged AS (
            SELECT b, CAST(SUM(n) AS BIGINT) AS n FROM pf GROUP BY 1),
          cm AS (
            SELECT b, SUM(n) OVER (ORDER BY b) AS cum FROM merged),
          totals AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM merged),
          direct AS (
            SELECT ${qBucketSql("v")} AS b, COUNT(*) AS n FROM li GROUP BY 1),
          cmd AS (
            SELECT b, SUM(n) OVER (ORDER BY b) AS cum FROM direct),
          totd AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM direct),
          ps AS (SELECT * FROM (VALUES (50), (90), (99)) AS t(p)),
          est AS (
            SELECT p, MIN(b) AS bq
            FROM (SELECT p, ${qRankSql("n_total", "p")} AS rank
                  FROM ps, totals) r
            JOIN cm ON cum >= rank GROUP BY 1),
          estd AS (
            SELECT p, MIN(b) AS bq
            FROM (SELECT p, ${qRankSql("n_total", "p")} AS rank
                  FROM ps, totd) r
            JOIN cmd ON cum >= rank GROUP BY 1),
          nm AS (
            SELECT COUNT(DISTINCT l_returnflag) AS n_sketches_merged
            FROM pf)
          SELECT CAST(p AS BIGINT) AS p, n_sketches_merged,
            CAST(${qLowerSql("est.bq")} AS BIGINT) AS est_merged_cents,
            CAST(${qLowerSql("estd.bq")} AS BIGINT) AS est_direct_cents
          FROM est JOIN estd USING (p), nm ORDER BY p"""
      }),

    // Bloom membership, exact vs sketch: the BUILDING-segment customer
    // set becomes a <= 4096-position filter built in ONE aggregate;
    // probing any key set is a broadcast join against it — the "was
    // this id in that corpus" primitive a pipeline answers per shard
    // without shipping the corpus. The row shows the one-sided
    // contract on real data: every true member answers yes (no false
    // negatives, n_bloom_yes == n_probes on the member side); the
    // non-member side counts the k-way-collision false positives.
    QueryDef("q_bloom_membership",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val member = col("c_mktsegment") === "BUILDING" &&
          col("c_custkey") % 10 === 1
        val bits = cust.filter(member)
          .select(bloomPos(col("c_custkey")).as("pos")).distinct()
        val ppos = cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("k"), member.as("is_member"),
            bloomPos(col("c_custkey")).as("pos")).distinct()
        ppos
          .join(broadcast(bits.withColumn("present", lit(1))),
            Seq("pos"), "left")
          .groupBy("k", "is_member")
          .agg((count(lit(1)) === count(col("present"))).as("bloom_yes"))
          .groupBy("is_member")
          .agg(count(lit(1)).as("n_probes"),
            sum(when(col("bloom_yes"), 1L).otherwise(0L)).as("n_bloom_yes"))
          .orderBy("is_member")
      },
      Some {
        val key = "CAST(c_custkey AS VARCHAR)"
        s"""WITH bits AS (
            SELECT DISTINCT ${sqlBloomPos(key)} AS pos
            FROM customer
            WHERE c_mktsegment = 'BUILDING' AND c_custkey % 10 = 1),
          ppos AS (
            SELECT DISTINCT c_custkey AS k,
              c_mktsegment = 'BUILDING' AND c_custkey % 10 = 1 AS is_member,
              ${sqlBloomPos(key)} AS pos
            FROM customer WHERE c_custkey % 3 = 0),
          per AS (
            SELECT k, is_member,
              COUNT(*) = COUNT(b.pos) AS bloom_yes
            FROM ppos p LEFT JOIN bits b USING (pos)
            GROUP BY 1, 2)
          SELECT is_member, COUNT(*) AS n_probes,
            CAST(SUM(CASE WHEN bloom_yes THEN 1 ELSE 0 END) AS BIGINT)
              AS n_bloom_yes
          FROM per GROUP BY 1 ORDER BY is_member"""
      }),

    // MERGE per-segment Bloom filters into the union filter — position
    // sets union by plain DISTINCT (exact, like quantile histograms
    // and unlike HLL's approximate union): the merged filter answers
    // membership for the union of segments identically to one built
    // directly, proven by probing every customer key through both.
    QueryDef("q_bloom_union",
      (s, dir) => {
        val out = bloomUnionAgg(s, dir)
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      },
      Some {
        val key = "CAST(c_custkey AS VARCHAR)"
        s"""WITH pseg AS (
            SELECT DISTINCT c_mktsegment AS seg, ${sqlBloomPos(key)} AS pos
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
              AND c_custkey % 10 = 1),
          merged AS (SELECT DISTINCT pos FROM pseg),
          probes AS (
            SELECT DISTINCT c_custkey AS k, ${sqlBloomPos(key)} AS pos
            FROM customer),
          per AS (
            SELECT k, COUNT(*) = COUNT(m.pos) AS y
            FROM probes p LEFT JOIN merged m USING (pos)
            GROUP BY 1)
          SELECT
            (SELECT COUNT(DISTINCT seg) FROM pseg) AS n_sketches_merged,
            CAST((SELECT SUM(CASE WHEN y THEN 1 ELSE 0 END) FROM per)
              AS BIGINT) AS n_yes_merged,
            CAST((SELECT SUM(CASE WHEN y THEN 1 ELSE 0 END) FROM per)
              AS BIGINT) AS n_yes_direct"""
      })
  )

  /** The distributed aggregation `q_bloom_union` collects (3 scalar
    * columns) — exposed for PlanPair so the committed plan evidence
    * shows the real probe-pass shape, not the post-collect local
    * relation.
    */
  private[graft] def bloomUnionAgg(s: SparkSession,
      dir: String): DataFrame = {
        val cust = t(s, dir, "customer")
        val segs = Seq("BUILDING", "MACHINERY")
        val inSeg = col("c_mktsegment").isin(segs: _*) &&
          col("c_custkey") % 10 === 1
        val perSeg = cust.filter(inSeg)
          .select(col("c_mktsegment").as("seg"),
            bloomPos(col("c_custkey")).as("pos")).distinct()
        val merged = perSeg.select("pos").distinct()
        val direct = cust.filter(inSeg)
          .select(bloomPos(col("c_custkey")).as("pos")).distinct()
        // ONE probe pass answers BOTH filters: the two (≤4096-position,
        // broadcastable at any scale) filter sets left-join the same
        // exploded probe frame side by side, so the all-customer
        // position set is scanned once instead of twice — which also
        // removes the persist it existed to amortize (the subtree now
        // has exactly one consumer; guide §2.4, §5 "cache only what is
        // reused"). Both filters are still built independently (the
        // merge-losslessness proof is unchanged).
        val probes = cust
          .select(col("c_custkey").as("k"), bloomPos(col("c_custkey")).as("pos"))
          .distinct()
        val out = probes
          .join(broadcast(merged.withColumn("pm", lit(1))), Seq("pos"), "left")
          .join(broadcast(direct.withColumn("pd", lit(1))), Seq("pos"), "left")
          .groupBy("k")
          .agg((count(lit(1)) === count(col("pm"))).as("ym"),
            (count(lit(1)) === count(col("pd"))).as("yd"))
          .agg(sum(when(col("ym"), 1L).otherwise(0L)).as("n_yes_merged"),
            sum(when(col("yd"), 1L).otherwise(0L)).as("n_yes_direct"))
          .crossJoin(perSeg.agg(
            countDistinct("seg").as("n_sketches_merged")))
          .select("n_sketches_merged", "n_yes_merged", "n_yes_direct")
        out
  }
}
