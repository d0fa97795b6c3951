package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Writes request clustering: a many-partition insert into a PK table
  * produces at most shuffle.partitions files per bucket group, not
  * inputPartitions x buckets.
  */
class WriteDistributionSpec extends AnyFunSuite {

  test("clustered write bounds file count") {
    val warehouse = Files.createTempDirectory("graft-dist-wh")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse.toString)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      spark.sql("CREATE NAMESPACE graft.d")
      spark.sql("CREATE TABLE graft.d.t (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('primary-key'='k','bucket'='4')")
      // 64 input partitions of source data
      spark.range(0, 1000, 1, 64).createOrReplaceTempView("src")
      spark.sql("INSERT INTO graft.d.t SELECT id, CAST(id AS STRING) FROM src")
      val files = new graft.format.SnapshotManager(
        warehouse.resolve("d.db/t")).liveFilesLatest
      // without clustering: up to 64 tasks x 4 buckets = 256 files;
      // with clustering: <= shuffle.partitions x buckets-per-task = 16
      assert(files.size <= 16, s"got ${files.size} files")
      assert(spark.table("graft.d.t").count() == 1000)
    } finally spark.stop()
  }
}
