package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Similarity search over the `embeddings` table (`embedding:
  * Array[Float]`, 64-d; `label` serves as a coarse IVF cell id).
  *
  * The dot product / norm is a single codegen'd higher-order-function
  * chain (`aggregate(zip_with(...))`), accumulated in double, in-row —
  * no UDF, no shuffle for the scoring pass. Brute-force top-k is the
  * correctness baseline; the IVF variant restricts candidates to the
  * query's cell, which is the 100 TB scale path (cells ≙ partition
  * pruning on the candidate side).
  */
object Similarity {

  /** cosine(a, b) with explicit left-fold-in-double accumulation. */
  private val cosExpr =
    """(aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
       / (sqrt(aggregate(qv, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        * sqrt(aggregate(cv, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""

  val defs: Seq[QueryDef] = Seq(
    // Brute-force cosine top-k for 5 probe vectors against the corpus.
    QueryDef("s_cosine_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val corpus = emb
          .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
        val scored = corpus.crossJoin(broadcast(probes))
          .filter(col("cand_id") =!= col("query_id"))
          .withColumn("cos", expr(cosExpr))
        val w = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("cand_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("cand_id"))
          .orderBy("query_id", "rank")
      },
      None),

    // IVF-style ANN: search only the probe's own cell (label).
    QueryDef("s_ann_ivf_cell",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("label").as("cell"))
        val corpus = emb
          .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
            col("label"))
        val scored = corpus.join(broadcast(probes),
            col("label") === col("cell") && col("cand_id") =!= col("query_id"))
          .withColumn("cos", expr(cosExpr))
        val w = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("cand_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("cand_id"))
          .orderBy("query_id", "rank")
      },
      None),

    // Embedding near-duplicate detection, blocked by cell (label) so the
    // pair space is within-cell only.
    QueryDef("d_embedding_neardup",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val a = emb.select(col("vec_id").as("ida"), col("embedding").as("qv"),
          col("label"))
        val b = emb.select(col("vec_id").as("idb"), col("embedding").as("cv"),
          col("label"))
        a.join(b, Seq("label"))
          .filter(col("ida") < col("idb"))
          .withColumn("cos", expr(cosExpr))
          .filter(col("cos") > 0.95)
          .agg(count(lit(1)).as("n_neardup_pairs"))
      },
      None),

    // Centroid summary per cell: element-wise mean vector norm — the
    // "train coarse quantizer" step of IVF, as a single shuffle agg.
    QueryDef("s_cell_stats",
      (s, dir) => t(s, dir, "embeddings")
        .groupBy("label")
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy("label"),
      Some("""SELECT label, COUNT(*) AS n_vectors
        FROM embeddings GROUP BY label ORDER BY label"""))
  )
}
