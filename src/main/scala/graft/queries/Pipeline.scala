package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
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
    (String, String), org.apache.spark.sql.DataFrame]()

  private[graft] def dupClusterLabels(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    labelsMemo.computeIfAbsent((SessionKey.id(s), dir),
      _ => computeDupClusterLabels(s, dir))

  def releaseDupClusterLabels(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit =
    Option(labelsMemo.remove((SessionKey.id(s), dir)))
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

  /** Edge-count threshold below which connected components run as a
    * driver-side union-find instead of distributed star contraction:
    * 500k (a, b) longs is ~8 MB on the driver — the constant-size sync
    * every production CC implementation short-circuits to, because a
    * distributed round costs whole-job latency regardless of data
    * size (3 shuffles + a checkpoint per round vs one collect). The
    * pair frame is already persisted AND counted by the memo, so the
    * gate reads a cached count.
    */
  private[graft] val MaxDriverEdges = 500000L

  /** Near-duplicate cluster labels. Above [[MaxDriverEdges]]:
    * DISTRIBUTED connected components via two-phase star contraction
    * ([[starContractionCC]]) — nothing is collected to the driver, so
    * a 100 TB corpus whose pair set is billions of edges still fits,
    * in O(log n) rounds regardless of component diameter. At or
    * below it: [[driverUnionFind]] over the collected edge list. Both
    * converge labels to the MINIMUM doc_id of each component, so
    * `lbl` doubles as the cluster's canonical representative
    * (PropertySpec pins the equivalence on random graphs).
    */
  private def computeDupClusterLabels(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val pairs = Dedup.nearDupPairs(s, dir)
    val n = pairs.count()
    // branch selection is part of the scale evidence — log it so a
    // gate-crossing run proves the distributed path ran naturally
    if (n <= MaxDriverEdges) {
      System.err.println(
        s"[gate] dup-cluster CC: $n edges <= $MaxDriverEdges -> driverUnionFind")
      driverUnionFind(s, pairs)
    } else {
      System.err.println(
        s"[gate] dup-cluster CC: $n edges > $MaxDriverEdges -> starContractionCC")
      starContractionCC(pairs)._1
    }
  }

  /** Min-label connected components of a small edge set, on the
    * driver: classic union-find with path compression + union by
    * rank, then each node labels itself with its component's minimum
    * id. Same output contract as [[starContractionCC]] — one
    * `(id, lbl)` row per node appearing in `pairs`.
    */
  private[graft] def driverUnionFind(s: org.apache.spark.sql.SparkSession,
      pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val edges = pairs.select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    val rank = scala.collection.mutable.HashMap.empty[Long, Int]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root)
        root = parent.getOrElse(root, root)
      var cur = x
      while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (qa, qb) = (rank.getOrElse(ra, 0), rank.getOrElse(rb, 0))
        if (qa < qb) parent(ra) = rb
        else if (qa > qb) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) = qa + 1 }
      }
    }
    val minOf = scala.collection.mutable.HashMap.empty[Long, Long]
    parent.keys.foreach { id =>
      val r = find(id)
      minOf(r) = math.min(minOf.getOrElse(r, Long.MaxValue), id)
    }
    import s.implicits._
    parent.keys.toSeq.sorted.map(id => (id, minOf(find(id))))
      .toDF("id", "lbl")
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14): each round every node hooks its larger
    * neighbors (large-star) then its smaller neighbors and itself
    * (small-star) onto the minimum of the relevant neighborhood, which
    * at least halves component height — O(log n) rounds where plain
    * min-label propagation needs O(diameter), unbounded on an
    * adversarial duplicate CHAIN (doc A ~ B ~ ... ~ Z).
    *
    * Input: undirected edges `(a, b)` with `a < b`, distinct node ids.
    * Returns the `(id, lbl)` frame (every node appearing in `pairs`,
    * `lbl` = component-minimum id; the representative maps to itself)
    * as an eager localCheckpoint, plus the number of rounds run. Each
    * round's intermediates are checkpointed (lineage truncated) and the
    * previous round's blocks freed, so executor storage stays O(edges)
    * over rounds; the fixpoint test (both star steps rewrote zero
    * edges) rides the checkpoint jobs via `observe`, never a driver
    * data path.
    */
  private[graft] def starContractionCC(
      pairs: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Int) = {
    // getOrEmpty, not get: the checkpoint has already materialized the
    // action, and on an all-empty plan the metrics node may never fire
    // (no partitions) — absent or null sum both mean zero rewrites
    def changedOf(o: Observation): Long =
      o.get.get("changed").flatMap(Option(_))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    import org.apache.spark.sql.expressions.Window
    // orientation invariant throughout: hi > lo on every edge
    var e = pairs.select(col("b").as("hi"), col("a").as("lo"))
      .localCheckpoint()
    var rounds = 0
    var changed = 1L
    while (changed > 0) {
      rounds += 1
      // monotone contraction converges; the cap is a defense against a
      // future edit breaking monotonicity into a silent infinite loop
      require(rounds <= 100,
        s"star contraction did not converge after $rounds rounds")
      val obsL = Observation(s"dup_cc_large_$rounds")
      val obsS = Observation(s"dup_cc_small_$rounds")
      // Both star steps as WINDOW mins (whole-partition frame), so one
      // round is ONE action over a single plan — the groupBy+self-join
      // formulation referenced each intermediate twice, forcing a
      // checkpoint per star step (2 jobs, 5 shuffles per round; on the
      // KB-scale pair graphs the job latency, not the data, was the
      // round cost). Windows keep every frame referenced once: 1 job,
      // 3 shuffles, 1 checkpoint per round, same rows out (the
      // intermediate dedup the join form needed is subsumed by the
      // final distinct — duplicates cannot change a min or the
      // zero-ness of the rewrite counts).
      //
      // large-star: each node u hooks its LARGER neighbors onto
      // m = min(N(u) ∪ {u})
      val sym = e.select(col("hi").as("src"), col("lo").as("dst"))
        .union(e.select(col("lo").as("src"), col("hi").as("dst")))
      val ls = sym
        .withColumn("m",
          least(min("dst").over(Window.partitionBy("src")), col("src")))
        .filter(col("dst") > col("src"))
        .observe(obsL,
          sum(when(col("m") =!= col("src"), 1L).otherwise(0L)).as("changed"))
        .select(col("dst").as("hi"), col("m").as("lo"))
      // small-star: each node hooks its SMALLER neighbors and itself
      // onto m = min of those neighbors (all lo < hi by orientation)
      val ss = ls
        .withColumn("m", min("lo").over(Window.partitionBy("hi")))
        .observe(obsS,
          sum(when(col("m") =!= col("lo"), 1L).otherwise(0L)).as("changed"))
        .select(explode(array(col("lo"), col("hi"))).as("v"), col("m"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
        .localCheckpoint()
      changed = changedOf(obsL) + changedOf(obsS)
      // ss is materialized — the previous edge set is dead; free its
      // blocks deterministically
      freeCheckpoint(e)
      e = ss
    }
    // fixpoint = one star per component, rooted at the component min:
    // every non-root appears exactly once as hi. Roots (and only
    // roots) are absent from the hi side — they label themselves.
    val nodes = pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id"))).distinct()
    val labels = nodes
      .join(e.select(col("hi").as("id"), col("lo").as("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
      .localCheckpoint()
    freeCheckpoint(e)
    (labels, rounds)
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
