package graft.tools

import org.apache.spark.sql.SparkSession

/** Live walkthrough of the file.format option (parquet/orc/avro).
  * {{{ sbt "runMain graft.tools.FormatDemo" }}}
  */
object FormatDemo {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-fmt-demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE graft.demo")

    Seq("orc", "avro").foreach { fmt =>
      println(s"== $fmt PK table: upsert + merge + timestamp round-trip")
      spark.sql(s"CREATE TABLE graft.demo.t_$fmt (k BIGINT, v STRING, ts TIMESTAMP) " +
        s"TBLPROPERTIES ('primary-key'='k','bucket'='1','file.format'='$fmt')")
      spark.sql(s"INSERT INTO graft.demo.t_$fmt VALUES " +
        "(1,'a',TIMESTAMP'2024-01-01 01:02:03.456789'), (2,'b',TIMESTAMP'2024-06-01 00:00:00')")
      spark.sql(s"INSERT INTO graft.demo.t_$fmt VALUES (2,'B',TIMESTAMP'2024-07-01 12:00:00')")
      spark.sql(s"SELECT * FROM graft.demo.t_$fmt ORDER BY k").show(truncate = false)
      val files = java.nio.file.Files.walk(wh.resolve(s"demo.db/t_$fmt"))
        .filter(p => p.toString.contains("bucket-")).toArray.map(_.toString)
      println(s"  data files: ${files.map(f => f.split('/').last).mkString(", ")}")
    }

    println("== probe: file.format='csv'")
    try spark.sql("CREATE TABLE graft.demo.bad (x INT) TBLPROPERTIES ('file.format'='csv')")
    catch { case e: Exception => println("  rejected: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
