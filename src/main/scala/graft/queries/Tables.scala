package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Helpers shared by the query inventory.
  *
  * Determinism rules for DuckDB-oracle parity (driver hashes values):
  *  - Money sums: per-row `ROUND(x*100)` to exact bigint cents, sum as
  *    bigint (exact, order-independent), divide once at the end. Plain
  *    `sum(double)` is order-dependent in the low ulps and would
  *    hash-mismatch between Spark and DuckDB.
  *  - Every query ends in an unambiguous ORDER BY (unique key tiebreak)
  *    so row order matches even if the driver compares ordered.
  *  - Column names are aliased identically in Spark and oracle SQL.
  */
object Tables {
  /** The testdata parquet stores TIMESTAMP(NANOS), which Spark's reader
    * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * and these columns arrive as LongType nanos — convert back to
    * micros TimestampType here (lossless: the data is micro-precision).
    */
  private val tsColumns = Set("o_orderdate", "l_shipdate", "ts")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (tsColumns(f.name) && f.dataType == org.apache.spark.sql.types.LongType)
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      else d
    }
  }

  /** [[t]] rebalanced to cluster parallelism when the source planned
    * fewer input splits than half the cores AND the corpus is big
    * enough that the serial map stage it unblocks (tokenize/shingle/
    * hash) dominates the round-robin shuffle's cost. The byte gate is
    * measured, not guessed: at sf0.1 (sub-MB parquet) the shuffle
    * LOSES — six adopting queries ran 12.6s with an unconditional
    * split-count gate vs 11.4s without it (s_quantize_int8 1.1s→0.6s,
    * d_decontaminate 2.8s→2.35s, d_embedding_lsh_neardup 1.76s→1.48s)
    * — while a single-digit-GiB unsplittable file (one giant row
    * group) on one core is exactly where the one-time shuffle of the
    * raw bytes is dwarfed by the map work. At corpus scale the scan
    * plans thousands of splits and this is a no-op either way.
    */
  def tBalanced(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val parallelism = spark.sparkContext.defaultParallelism
    val fewSplits = df.rdd.getNumPartitions * 2 < parallelism
    if (!fewSplits) return df
    // ≥4 MiB of compressed parquet per idle core before shuffling pays.
    // Sum the actual input files: File.length on a DIRECTORY-backed
    // parquet table returns the dir-entry size (~4 KiB), which would
    // silently keep a large few-split corpus serial — the exact case
    // this helper exists for. inputFiles comes from the already-planned
    // scan (no extra listing); non-file URIs go through their Hadoop
    // filesystem (a File.length on a remote URI's path part would
    // silently report 0 and re-introduce the serial failure mode).
    // Only computed on the fewSplits path, so the status calls are
    // bounded by a handful of files.
    lazy val hconf = spark.sessionState.newHadoopConf()
    val bytes = df.inputFiles.map { f =>
      try {
        val uri = java.net.URI.create(f)
        if (uri.getScheme == null || uri.getScheme == "file")
          new java.io.File(uri.getPath).length
        else {
          val p = new org.apache.hadoop.fs.Path(uri)
          p.getFileSystem(hconf).getFileStatus(p).getLen
        }
      } catch {
        case _: IllegalArgumentException | _: java.io.IOException => 0L
      }
    }.sum
    val bigEnough = bytes > parallelism.toLong * (4L << 20)
    if (bigEnough) df.repartition(parallelism) else df
  }

  /** [[t]] spread to cluster parallelism whenever the scan planned
    * fewer splits than half the cores — NO byte gate, unlike
    * [[tBalanced]]. For md5-class consumers only (MinHash signatures,
    * fingerprints, per-window hashing): their per-byte map CPU is
    * 1–2 orders of magnitude above the tokenize-class kernels the
    * tBalanced byte gate was measured on, so a serial map stage costs
    * seconds where the rebalance exchange costs the move of sub-MB
    * raw text once (measured: the LSH pipeline build's
    * tokenize+shingle+sign stage 1.5 s serial → ~0.2 s spread at
    * sf0.1; guide §2.5 "input skew", §1.2 step 1). At scale the scan
    * plans thousands of splits and this is a no-op. Deterministic
    * hash key (never rand/round-robin) so retried tasks reproduce
    * their placement (SPARK-38388).
    */
  def tSpreadHeavy(spark: SparkSession, dir: String, name: String,
      key: String): DataFrame = {
    val df = t(spark, dir, name)
    val parallelism = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < parallelism)
      df.repartition(parallelism, col(key))
    else df
  }

  /** Exact bigint cents of a double money column: ROUND(x*100) as long. */
  /** Whitespace-normalized md5 document fingerprint — THE document
    * identity the exact-dedup / ingest-dedup / fingerprint-banding
    * families share. One definition per engine dialect (the Spark and
    * DuckDB forms must stay equivalent: Java `\s+` vs RE2 global
    * flag); every site routes through here so an edit to the
    * normalization moves the whole family together.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(trim(lower(c)), "\\s+", " "))

  /** [[fingerprint]] in DuckDB SQL over an expression. */
  def sqlFingerprint(e: String): String =
    s"md5(regexp_replace(trim(lower($e)), '\\s+', ' ', 'g'))"

  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** sum of exact cents back to a 2-decimal double — deterministic. */
  def sumMoney(c: Column): Column = (sum(cents(c)) / 100.0)

  /** Same expression in DuckDB SQL. */
  def sqlCents(e: String): String = s"CAST(ROUND(($e)*100,0) AS BIGINT)"
  def sqlSumMoney(e: String): String = s"(SUM(${sqlCents(e)})/100.0)"

  /** Engine-portable 60-bit hash: first 15 hex chars of md5, parsed as
    * a (positive) BIGINT. Unlike xxhash64 (Spark-internal), md5 is
    * identical in DuckDB, so queries built on it stay oracle-checkable.
    * The seeded variant appends `#seed` before hashing. Evaluated by
    * the codegen [[graft.functions.Md5Prefix60]] kernel (one digest,
    * no hex-string round-trip — bit-identical to the
    * `conv(substring(md5(x), 1, 15), 16, 10)` definition the DuckDB
    * oracles state; FunctionsSpec pins the equivalence).
    */
  def h60(c: Column, seed: Int): Column =
    graft.functions.HashFunctions.md5_prefix60(
      concat(c.cast("string"), lit("#" + seed)))

  def h60s(c: Column): Column =
    graft.functions.HashFunctions.md5_prefix60(c.cast("string"))

  /** The same two hashes in DuckDB SQL. */
  def sqlH60(e: String, seed: Int): String =
    s"CAST('0x' || substr(md5(($e) || '#' || $seed), 1, 15) AS BIGINT)"
  def sqlH60s(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
}
