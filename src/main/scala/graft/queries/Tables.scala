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
    * fewer input splits than half the cores — the CPU-heavy map stages
    * (tokenize/shingle/hash) must not run on one core just because a
    * small corpus landed in one parquet row group. At corpus scale the
    * scan itself yields thousands of splits and this is a no-op, which
    * is exactly the cluster-faithful behavior: the round-robin shuffle
    * only ever pays when its cost (the raw column bytes, once) is
    * dwarfed by the serial map stage it unblocks.
    */
  def tBalanced(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val parallelism = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < parallelism) df.repartition(parallelism)
    else df
  }

  /** Exact bigint cents of a double money column: ROUND(x*100) as long. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** sum of exact cents back to a 2-decimal double — deterministic. */
  def sumMoney(c: Column): Column = (sum(cents(c)) / 100.0)

  /** Same expression in DuckDB SQL. */
  def sqlCents(e: String): String = s"CAST(ROUND(($e)*100,0) AS BIGINT)"
  def sqlSumMoney(e: String): String = s"(SUM(${sqlCents(e)})/100.0)"

  /** Engine-portable 60-bit hash: first 15 hex chars of md5, parsed as
    * a (positive) BIGINT. Unlike xxhash64 (Spark-internal), md5 is
    * identical in DuckDB, so queries built on it stay oracle-checkable.
    * The seeded variant appends `#seed` before hashing.
    */
  def h60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(c.cast("string"), lit("#" + seed))), 1, 15),
      16, 10).cast("long")

  def h60s(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** The same two hashes in DuckDB SQL. */
  def sqlH60(e: String, seed: Int): String =
    s"CAST('0x' || substr(md5(($e) || '#' || $seed), 1, 15) AS BIGINT)"
  def sqlH60s(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
}
