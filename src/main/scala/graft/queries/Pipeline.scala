package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Tables._

/** Composite training-data-pipeline queries: the quality-filter
  * selection pass and near-duplicate cluster resolution — the
  * "keep/drop" decisions a 100 TB corpus pipeline actually executes,
  * built from the text/dedup primitives.
  */
object Pipeline {

  private def tokens = graft.functions.TextFunctions.ascii_words(col("text"))

  /** Connected-component labels (id, lbl) over the near-dup pair set,
    * memoized per (session, dir): `d_dedup_apply` and `d_dup_clusters`
    * share ONE min-label propagation (the pair set itself is already
    * shared via [[Dedup.nearDupPairs]]). The final frame is a
    * localCheckpoint — call [[releaseDupClusterLabels]] when done with
    * a dir so its blocks don't outlive their usefulness.
    */
  private val labelsMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), org.apache.spark.sql.DataFrame]()

  private[graft] def dupClusterLabels(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    labelsMemo.computeIfAbsent((System.identityHashCode(s), dir),
      _ => computeDupClusterLabels(s, dir))

  def releaseDupClusterLabels(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit =
    Option(labelsMemo.remove((System.identityHashCode(s), dir)))
      .foreach(freeCheckpoint)

  def releaseAllDupClusterLabels(): Unit = {
    val it = labelsMemo.entrySet().iterator()
    while (it.hasNext) {
      freeCheckpoint(it.next().getValue)
      it.remove()
    }
  }

  /** Release a localCheckpoint frame's storage DETERMINISTICALLY:
    * `Dataset.unpersist` only clears CacheManager entries, so a
    * checkpointed frame's blocks otherwise wait for the async
    * ContextCleaner (a GC-driven "eventually"). Unpersist the
    * underlying RDD directly. */
  private def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    try {
      if (!df.sparkSession.sparkContext.isStopped)
        df.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }.foreach(_.unpersist(blocking = true))
    } catch { case _: Throwable => () } // racing stop: storage already gone

  /** Near-duplicate cluster labels: DISTRIBUTED connected components
    * over the LSH pair set — iterative min-label propagation to
    * fixpoint (~diameter rounds; near-dup clusters are shallow).
    * Nothing is collected to the driver, so a 100 TB corpus whose pair
    * set is billions of edges still fits: each round is one join + one
    * aggregation, lineage truncated per round. Min-label CC converges
    * to the MINIMUM doc_id of each component, so `lbl` doubles as the
    * cluster's canonical representative.
    */
  private def computeDupClusterLabels(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val pairs = Dedup.nearDupPairs(s, dir)
    // spillable level: the edge cache is re-read every round, and an
    // eviction here recomputes the whole LSH pair pipeline upstream
    val edges = pairs.selectExpr("a AS src", "b AS dst")
      .union(pairs.selectExpr("b AS src", "a AS dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // round 0 fused into init: label = min(self, neighbors); shallow
    // (pair-shaped) clusters then converge in ONE verification round
    var labels = edges.groupBy("src")
      .agg(least(min(col("dst")), col("src")).as("lbl"))
      .select(col("src").as("id"), col("lbl"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      // observe() rides the checkpoint job, so each round is ONE
      // materialization (join+agg) instead of checkpoint + a second
      // changed-count scan — halves the per-round job count.
      val obs = Observation(s"dup_clusters_round_$round")
      val prop = edges
        .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .groupBy(col("src").as("id")).agg(min("lbl").as("nbr"))
      val next = labels.select(col("id"), col("lbl").as("old"))
        .join(prop, Seq("id"), "left")
        .select(col("id"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("lbl"),
          (col("nbr").isNotNull && col("nbr") < col("old")).as("chg"))
        .observe(obs, sum(when(col("chg"), 1L).otherwise(0L)).as("changed"))
        .localCheckpoint()
      changed = Option(obs.get("changed"))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      // next is eagerly materialized above — the previous round's
      // checkpoint blocks are dead; free them (RDD-level, see
      // freeCheckpoint) so executor storage stays O(1) in rounds
      // instead of waiting on the GC-driven ContextCleaner.
      freeCheckpoint(labels)
      labels = next.select("id", "lbl")
    }
    edges.unpersist()
    labels
  }

  val defs: Seq[QueryDef] = Seq(
    // Quality filter: integer-only thresholds (counts compared
    // cross-multiplied, no divisions) → bit-deterministic oracle.
    // Keep: 20 <= n_tokens <= 200, stopword_ratio >= 5%,
    // mean token length <= 8.
    QueryDef("t_quality_filter_pipeline",
      (s, dir) => t(s, dir, "documents")
        .withColumn("toks", tokens)
        .select(col("doc_id"), col("lang"),
          size(col("toks")).as("n_tokens"),
          expr("size(filter(toks, w -> w IN ('the','a','and','of','to')))")
            .as("n_stop"),
          expr("aggregate(toks, 0L, (acc, w) -> acc + length(w))").as("sum_len"))
        .withColumn("keep",
          col("n_tokens").between(20, 200) &&
            col("n_stop") * 20 >= col("n_tokens") &&
            col("sum_len") <= col("n_tokens") * 8)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN n_tokens BETWEEN 20 AND 200
                    AND n_stop * 20 >= n_tokens
                    AND sum_len <= n_tokens * 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM (
          SELECT doc_id, lang, len(toks) AS n_tokens,
            len(list_filter(toks, w -> w IN ('the','a','and','of','to'))) AS n_stop,
            list_sum(list_transform(toks, w -> length(w))) AS sum_len
          FROM (SELECT doc_id, lang,
              regexp_extract_all(lower(text), '[a-z]+') AS toks
            FROM documents) a) b
        GROUP BY lang ORDER BY lang""")),

    // Reproducible stratified sampling: keep a doc iff the first two
    // hex chars of md5(doc_id) sort below '0d' (~5.1%). Hash-gated
    // sampling is map-only, needs no global count or RNG state, and
    // gives the SAME sample on any cluster size or re-run — the only
    // sampling scheme that stays reproducible across a 100 TB corpus
    // re-shard (md5 hex matches across engines; xxhash64 would not).
    QueryDef("t_hash_sample",
      (s, dir) => t(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "0d")
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n_sampled
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
        GROUP BY source ORDER BY source""")),

    // Near-duplicate cluster resolution over the shared CC labels
    // (see dupClusterLabels). Oracle: DuckDB recursive CTE
    // reachability over the same pairs.
    QueryDef("d_dup_clusters",
      (s, dir) => dupClusterLabels(s, dir)
        .groupBy("lbl").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_clusters"),
          coalesce(sum("sz"), lit(0L)).as("n_docs_in_clusters"),
          coalesce(max("sz"), lit(0L)).as("largest_cluster")),
      Some(s"""WITH RECURSIVE ${Dedup.sqlPairsCte},
        edges AS (SELECT a AS src, b AS dst FROM pairs
                  UNION ALL SELECT b, a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        lbl AS (
          SELECT src AS id, LEAST(src, MIN(dst)) AS lbl
          FROM reach GROUP BY src),
        cl AS (SELECT lbl, COUNT(*) AS sz FROM lbl GROUP BY lbl)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
          CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS n_docs_in_clusters,
          CAST(COALESCE(MAX(sz), 0) AS BIGINT) AS largest_cluster
        FROM cl""")),

    // APPLY the near-dup resolution — the pipeline's actual "dedup the
    // corpus" step: keep every unclustered doc plus exactly one
    // representative per cluster (min-label CC converges to the
    // minimum doc_id, so lbl == doc_id marks the keeper). One
    // left equi-join against the labels (cluster-members-sized, far
    // smaller than the corpus) and a per-source rollup — map-side at
    // 100 TB once AQE broadcasts the label set.
    QueryDef("d_dedup_apply",
      (s, dir) => {
        val labels = dupClusterLabels(s, dir)
          .select(col("id").as("doc_id"), col("lbl"))
        t(s, dir, "documents").select(col("doc_id"), col("source"))
          .join(labels, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("lbl").isNull || col("lbl") === col("doc_id"), 1L)
              .otherwise(0L)).as("n_kept"))
          .orderBy("source")
      },
      Some(s"""WITH RECURSIVE ${Dedup.sqlPairsCte},
        edges AS (SELECT a AS src, b AS dst FROM pairs
                  UNION ALL SELECT b, a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        lbl AS (
          SELECT src AS id, LEAST(src, MIN(dst)) AS lbl
          FROM reach GROUP BY src)
        SELECT d.source, COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN l.lbl IS NULL OR l.lbl = d.doc_id
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
        GROUP BY d.source ORDER BY d.source"""))
  )
}
