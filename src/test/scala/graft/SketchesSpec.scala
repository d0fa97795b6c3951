package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Statistical contracts of the sketch rows (the DuckDB oracle pins
  * bit-equality; these pin the MATH): CMS estimates never undercount,
  * and the HLL estimate lands within the published error band for
  * m = 64 registers.
  */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.01"

  test("CMS estimates are one-sided: never below the exact count") {
    val rows = graft.SparkEntry.queries("q_cms_heavy_hitters")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted user ${r.getLong(0)}: " +
          s"est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("HLL estimate within 5 standard errors (1.04/sqrt(64)) of exact") {
    val rows = graft.SparkEntry.queries("q_hll_distinct_users")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val band = 5 * 1.04 / math.sqrt(64.0) // ~65% relative, generous
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(2))
      assert(math.abs(est - exact) <= band * exact,
        s"HLL for ${r.getString(0)}: est $est vs exact $exact")
    }
  }
}
