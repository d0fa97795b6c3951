package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** Composite training-data-pipeline queries: the quality-filter
  * selection pass and near-duplicate cluster resolution — the
  * "keep/drop" decisions a 100 TB corpus pipeline actually executes,
  * built from the text/dedup primitives.
  */
object Pipeline {

  private val tokensExpr = "regexp_extract_all(lower(text), '[a-z]+', 0)"

  val defs: Seq[QueryDef] = Seq(
    // Quality filter: integer-only thresholds (counts compared
    // cross-multiplied, no divisions) → bit-deterministic oracle.
    // Keep: 20 <= n_tokens <= 200, stopword_ratio >= 5%,
    // mean token length <= 8.
    QueryDef("t_quality_filter_pipeline",
      (s, dir) => t(s, dir, "documents")
        .withColumn("toks", expr(tokensExpr))
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

    // Near-duplicate cluster resolution: union-find over the (small)
    // LSH candidate-pair set. Pairs are collected to the driver — at
    // 100 TB the pair set is orders of magnitude smaller than the
    // corpus (that is the point of LSH banding); beyond driver memory
    // the same step becomes iterative label propagation.
    QueryDef("d_dup_clusters",
      (s, dir) => {
        val pairs = Dedup.nearDupPairs(s, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          parent.update(x, r); r
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent.update(math.max(ra, rb), math.min(ra, rb))
        }
        val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val clusters = members.groupBy(find).values.toSeq
        import s.implicits._
        Seq((clusters.size.toLong,
          members.length.toLong,
          clusters.map(_.length).maxOption.getOrElse(0).toLong))
          .toDF("n_clusters", "n_docs_in_clusters", "largest_cluster")
      },
      None)
  )
}
