package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate a GATE-SCALE synthetic dataset: the sf0.1 tables with
  * `documents` and `embeddings` replaced by corpora sized to push every
  * driver-side short-circuit past its gate NATURALLY, so one
  * differential + bench run turns the forced-branch unit twins into
  * end-to-end evidence:
  *
  *  - near-dup pair edges > 500k ([[graft.queries.Pipeline]] MaxDriverEdges:
  *    1,300 planted clusters x 30 single-word-twist variants =
  *    C(30,2) x 1300 = 565,500 verified Jaccard>=0.5 pairs) → the
  *    distributed star-contraction CC branch;
  *  - distinct word types > 1M ([[graft.queries.Curation]] bpeDriverGate:
  *    121,000 filler docs x 10 unique words each = 1.21M types) → the
  *    distributed BPE merge rounds;
  *  - embedding vectors >= 1M ([[graft.queries.Similarity]] PQ persist
  *    gate: 1,050,000 vectors) → the persisted PQ-encode branch.
  *
  * Everything is DETERMINISTIC (xxhash64 arithmetic, no RNG state), so
  * the DuckDB oracle replays the same bytes. Filler docs interleave a
  * unique word into every 3-shingle (positions ≡ 1 mod 3), so they
  * produce no LSH candidates; cluster variants differ in one position,
  * so their pairwise 3-shingle Jaccard stays ≈ 0.87 — comfortably over
  * the 0.5 verify threshold and far under the 1000-doc bucket guard.
  * Unique words are digit→letter translations prefixed 'q'; the shared
  * vocabulary avoids 'q' so namespaces can't collide.
  *
  * {{{ sbt "runMain graft.tools.GateScaleGen [srcSfDir] [outDir]" }}}
  */
object GateScaleGen {
  private val Vocab: Seq[String] = Seq(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "index", "plan", "join", "shuffle", "cache", "disk",
    "node", "task", "stage", "block", "file", "page", "read", "write",
    "commit", "snap", "level", "range", "probe", "build", "emit", "fold",
    "span", "token", "word", "text", "model", "train", "serve", "code",
    "cell", "band", "sig", "label", "store", "state", "event", "tick")

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/gate_sf")
    val nClusters = 1300
    val perCluster = 30
    val nFiller = 121000
    val nVectors = 1050000L

    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    // the TPC-H-ish tables ride along unchanged (c_/q_ rows measure the
    // connector and relational layer, not the gate corpora)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(srcDir, s"$t.parquet"),
        out.resolve(s"$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocabLit = typedLit(Vocab)
    val nClusterDocs = nClusters * perCluster

    // ---- documents -----------------------------------------------------
    // cluster docs: 45 shared vocab words chosen by xxhash64(cluster,
    // pos) plus ONE variant-unique trailing word — pairwise 3-shingle
    // Jaccard ≈ 43/45 = 0.956, so 4-slot LSH bands catch essentially
    // every pair (p = 1-(1-0.956^4)^4 ≈ 0.999; the earlier
    // one-substitution design measured only ~83% band recall and left
    // the edge count shy of the 500k gate)
    val clusterDocs = spark.range(0, nClusterDocs.toLong, 1, 32)
      .selectExpr("id AS doc_id", s"id DIV $perCluster AS cl",
        s"id % $perCluster AS vr")
      .withColumn("vw", vocabLit)
      .withColumn("ws", expr(
        """transform(sequence(0, 44), j ->
          |  element_at(vw, CAST(pmod(xxhash64(cl, j), 64) AS INT) + 1))"""
          .stripMargin))
      .withColumn("text", expr(
        "concat(array_join(ws, ' '), ' t', " +
          "translate(CAST(doc_id AS STRING), '0123456789', 'abcdefghij'))"))
    // filler docs: 30 words, positions ≡1 (mod 3) are globally-unique
    // 'q'-prefixed words (digit→letter translate of a dense counter), so
    // every 3-shingle contains one and no two filler docs share a shingle
    val fillerDocs = spark.range(0, nFiller.toLong, 1, 32)
      .selectExpr(s"id + $nClusterDocs AS doc_id", "id AS fi")
      .withColumn("vw", vocabLit)
      .withColumn("text", expr(
        s"""array_join(transform(sequence(0, 29), j ->
           |  IF(j % 3 = 1,
           |     concat('q', translate(CAST(fi * 10 + j DIV 3 AS STRING),
           |       '0123456789', 'abcdefghij')),
           |     element_at(vw,
           |       CAST(pmod(xxhash64(fi, j, 'fw'), 64) AS INT) + 1))), ' ')"""
          .stripMargin))
    val docs = clusterDocs.select(col("doc_id"), col("text"))
      .unionByName(fillerDocs.select(col("doc_id"), col("text")))
      .withColumn("lang", expr(
        "element_at(array('de','en','es','fr','zh'), " +
          "CAST(pmod(xxhash64(doc_id, 'lg'), 5) AS INT) + 1)"))
      .withColumn("source", expr(
        "concat('src', CAST(pmod(doc_id, 20) AS STRING))"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    // the oracle harness reads each table as ONE parquet file (like the
    // driver's testdata): generate distributed, funnel to a single part
    // through a shuffle, then promote the part file to the table path
    def writeSingle(df: org.apache.spark.sql.DataFrame,
        name: String): Unit = {
      val tmp = out.resolve(s"$name.tmpdir")
      df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(tmp)
      val part =
        try ls.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally ls.close()
      java.nio.file.Files.move(part, out.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.util.Fs.deleteRecursively(tmp)
    }
    writeSingle(docs, "documents")

    // ---- embeddings ----------------------------------------------------
    // approx N(0, 0.13^2) per dim via Irwin-Hall (sum of 4 hash-uniforms
    // minus 2, scaled) — mean-0 like the driver's corpus so cosine
    // structure matches; label uniform 0..9
    val emb = spark.range(0, nVectors, 1, 64)
      .selectExpr("id AS vec_id")
      .withColumn("embedding", expr(
        """transform(sequence(0, 63), d -> CAST(0.225 * (
          |  pmod(xxhash64(vec_id, d, 'u1'), 1048576) / 1048576.0 +
          |  pmod(xxhash64(vec_id, d, 'u2'), 1048576) / 1048576.0 +
          |  pmod(xxhash64(vec_id, d, 'u3'), 1048576) / 1048576.0 +
          |  pmod(xxhash64(vec_id, d, 'u4'), 1048576) / 1048576.0 - 2.0)
          |  AS FLOAT))""".stripMargin))
      .withColumn("label", expr(
        "CAST(pmod(xxhash64(vec_id, 'lb'), 10) AS INT)"))
    writeSingle(emb, "embeddings")

    val nd = spark.read.parquet(out.resolve("documents.parquet").toString)
    val ne = spark.read.parquet(out.resolve("embeddings.parquet").toString)
    println(s"[gatescale] documents: ${nd.count()} docs, " +
      s"${nd.selectExpr("sum(n_chars)").head.getLong(0)} chars")
    println(s"[gatescale] distinct word types: " +
      nd.selectExpr("explode(split(text, ' ')) AS w")
        .agg(countDistinct("w")).head.getLong(0))
    println(s"[gatescale] embeddings: ${ne.count()} vectors")
    spark.stop()
  }
}
