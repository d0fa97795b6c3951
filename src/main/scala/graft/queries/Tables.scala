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

  /** Exact bigint cents of a double money column: ROUND(x*100) as long. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** sum of exact cents back to a 2-decimal double — deterministic. */
  def sumMoney(c: Column): Column = (sum(cents(c)) / 100.0)

  /** Same expression in DuckDB SQL. */
  def sqlCents(e: String): String = s"CAST(ROUND(($e)*100,0) AS BIGINT)"
  def sqlSumMoney(e: String): String = s"(SUM(${sqlCents(e)})/100.0)"
}
