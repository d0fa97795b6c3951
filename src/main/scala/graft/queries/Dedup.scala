package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** Deduplication family over `documents`: exact (hash-group), MinHash+LSH
  * (shingle → per-seed min → band → bucket-join), SimHash, and n-gram
  * Jaccard. Signatures are computed *per row* inside whole-stage codegen
  * (`transform`/`aggregate` higher-order functions over the token array —
  * no explode, no shuffle until the candidate-bucket join), so the
  * signature stage is a single map pass at 100 TB; only the tiny
  * candidate set shuffles.
  */
object Dedup {

  private val tokensExpr = "regexp_extract_all(lower(text), '[a-z]+', 0)"
  private val sqlTokens = "regexp_extract_all(lower(text), '[a-z]+')"

  // 3-token shingles of the token array, computed in-row.
  private val shinglesExpr =
    s"""transform(sequence(1, greatest(size($tokensExpr) - 2, 0)),
       i -> concat_ws(' ', slice($tokensExpr, i, 3)))"""

  // MinHash signature: k=16 seeded xxhash64 minima over the shingle set.
  private val K = 16
  private val R = 4 // rows per band
  private val B = K / R // 4 bands
  private val sigExpr =
    s"""transform(sequence(0, ${K - 1}),
       s -> array_min(transform(sh, g -> xxhash64(g, s))))"""

  val defs: Seq[QueryDef] = Seq(
    // Exact dedup: hash-groupBy on a normalized fingerprint.
    QueryDef("d_exact",
      (s, dir) => t(s, dir, "documents")
        .select(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
          .as("fp"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dups")),
      Some("""SELECT COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_unique,
          COUNT(*) - COUNT(DISTINCT fp) AS n_dups
        FROM (SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
              FROM documents) q""")),

    // Exact dedup, keep-first: representative row per fingerprint group.
    QueryDef("d_exact_keep_first",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("fp"))
        .groupBy("fp").agg(min(col("doc_id")).as("keep_doc_id"),
          count(lit(1)).as("group_size"))
        .groupBy("group_size").agg(count(lit(1)).as("n_groups"))
        .orderBy("group_size"),
      Some("""SELECT group_size, COUNT(*) AS n_groups FROM (
          SELECT fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS group_size
          FROM (SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
            FROM documents) q GROUP BY fp) g
        GROUP BY group_size ORDER BY group_size""")),

    // MinHash + LSH banding. No DuckDB oracle (xxhash64 is
    // Spark-internal) → driver records rows-only check; the ScalaTest
    // spec asserts planted near-duplicates are found.
    QueryDef("d_minhash_lsh",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("sh", expr(shinglesExpr))
          .filter(size(col("sh")) > 0)
          .withColumn("sig", expr(sigExpr))
        val bands = docs.select(col("doc_id"), col("sh"),
          posexplode(expr(s"transform(sequence(0, ${B - 1}), " +
            s"b -> xxhash64(slice(sig, b * $R + 1, $R), b))"))
            .as(Seq("band", "bhash")))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") &&
            col("x.bhash") === col("y.bhash") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
            col("x.sh").as("sha"), col("y.sh").as("shb"))
          .distinct()
        val confirmed = cand.withColumn("inter",
            expr("size(filter(array_distinct(sha), g -> array_contains(shb, g)))"))
          .withColumn("uni",
            expr("size(array_distinct(sha)) + size(array_distinct(shb)) - inter"))
          .filter(col("inter").cast("double") / col("uni") >= 0.5)
        confirmed.agg(count(lit(1)).as("n_neardup_pairs"))
      },
      None),

    // SimHash: 64-bit signature from per-token hash votes, in-row.
    QueryDef("d_simhash",
      (s, dir) => t(s, dir, "documents")
        .withColumn("toks", expr(tokensExpr))
        .filter(size(col("toks")) > 0)
        .withColumn("simhash",
          expr("""aggregate(sequence(0, 63), 0L, (acc, b) ->
            acc + if(aggregate(toks, 0L, (v, w) ->
              v + if((shiftright(xxhash64(w), b) & 1L) = 1L, 1L, -1L)) >= 0L,
              shiftleft(1L, b), 0L))"""))
        .select(col("doc_id"), col("simhash"))
        .groupBy(expr("simhash & 65535").as("band16"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_docs_in_collision_bands"),
          count(lit(1)).as("n_bands")),
      None),

    // n-gram Jaccard over adjacent doc pairs (windowed candidate set) —
    // SQL-expressible, exact-integer arithmetic → full DuckDB oracle.
    QueryDef("d_ngram_jaccard",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), expr(s"array_distinct($tokensExpr)").as("tk"))
        docs.as("a").join(docs.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            expr("size(filter(a.tk, w -> array_contains(b.tk, w)))").as("inter"),
            (size(col("a.tk")) + size(col("b.tk"))).as("total"))
          .select(col("doc_a"), col("doc_b"),
            (col("inter").cast("double") / (col("total") - col("inter")))
              .as("jaccard"))
          .orderBy("doc_a")
      },
      Some("""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          (CAST(len(list_filter(a.tk, w -> list_contains(b.tk, w))) AS DOUBLE)
            / (len(a.tk) + len(b.tk)
               - len(list_filter(a.tk, w -> list_contains(b.tk, w))))) AS jaccard
        FROM (SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS tk
              FROM documents) a
        JOIN (SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS tk
              FROM documents) b
          ON b.doc_id = a.doc_id + 1
        ORDER BY doc_a"""))
  )
}
