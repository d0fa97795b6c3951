package graft.tools

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the table-format connector through plain
  * Spark SQL — the exact surface a user of the library sees. Creates a
  * warehouse in a temp dir, runs DDL/DML/queries, prints results and
  * the physical plan of a pruned scan.
  *
  * {{{ sbt "runMain graft.tools.ConnectorDemo" }}}
  */
object ConnectorDemo {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-demo-wh")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-connector-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sql("CREATE NAMESPACE graft.demo")
    spark.sql("CREATE TABLE graft.demo.users (pt INT, id BIGINT, name STRING, score DOUBLE) " +
      "PARTITIONED BY (pt) TBLPROPERTIES ('primary-key'='pt,id', 'bucket'='4')")

    println("== commit 1: initial insert")
    spark.sql("INSERT INTO graft.demo.users VALUES " +
      "(1, 1, 'alice', 10.0), (1, 2, 'bob', 20.0), (2, 3, 'carol', 30.0)")
    spark.sql("SELECT * FROM graft.demo.users ORDER BY id").show()

    println("== commit 2: upsert id=2, insert id=4 (merge-on-read last-write-wins)")
    spark.sql("INSERT INTO graft.demo.users VALUES (1, 2, 'BOB v2', 21.0), (2, 4, 'dave', 40.0)")
    spark.sql("SELECT * FROM graft.demo.users ORDER BY id").show()

    println("== join with an ordinary DataFrame + aggregate over the merged view")
    spark.sql("SELECT pt, count(*) AS n, sum(score) AS total FROM graft.demo.users GROUP BY pt ORDER BY pt").show()

    println("== partition-pruned + key-pruned scan plan (pt=1 AND id=2)")
    spark.sql("SELECT name FROM graft.demo.users WHERE pt = 1 AND id = 2").explain()
    spark.sql("SELECT name FROM graft.demo.users WHERE pt = 1 AND id = 2").show()

    println("== INSERT OVERWRITE static partition pt=2")
    spark.sql("INSERT OVERWRITE graft.demo.users PARTITION (pt=2) VALUES (99, 'zed', 0.0)")
    spark.sql("SELECT * FROM graft.demo.users ORDER BY id").show()

    println("== snapshots on disk")
    val snapDir = wh.resolve("demo.db/users/snapshot")
    java.nio.file.Files.list(snapDir).forEach(p => println("  " + p.getFileName))

    println("== error surfaces: unsupported nested type")
    try spark.sql("CREATE TABLE graft.demo.bad (x MAP<STRING,INT>)")
    catch { case e: Exception => println("  rejected: " + e.getMessage.linesIterator.next()) }

    println("== error surfaces: PK table without bucket")
    try spark.sql("CREATE TABLE graft.demo.bad2 (x INT) TBLPROPERTIES ('primary-key'='x')")
    catch { case e: Exception => println("  rejected: " + e.getMessage.linesIterator.next()) }

    spark.stop()
  }
}
