package graft.tools

import org.apache.spark.sql.SparkSession

/** Live walkthrough: ALTER TABLE ADD COLUMN null-fill + partition DELETE.
  * {{{ sbt "runMain graft.tools.EvolutionDemo" }}}
  */
object EvolutionDemo {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-evo-demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sql("CREATE NAMESPACE graft.demo")
    spark.sql("CREATE TABLE graft.demo.t (f0 INT, f1 STRING)")
    spark.sql("INSERT INTO graft.demo.t VALUES (1,'a'), (2,'b')")
    println("== ALTER TABLE ADD COLUMN f2 DOUBLE; old files null-fill")
    spark.sql("ALTER TABLE graft.demo.t ADD COLUMN f2 DOUBLE")
    spark.sql("INSERT INTO graft.demo.t VALUES (3,'c', 3.5)")
    spark.sql("SELECT * FROM graft.demo.t ORDER BY f0").show()
    println("== filter on evolved column")
    spark.sql("SELECT count(*) AS n_null_f2 FROM graft.demo.t WHERE f2 IS NULL").show()
    println("== probe: DROP COLUMN")
    try spark.sql("ALTER TABLE graft.demo.t DROP COLUMN f1")
    catch { case e: Exception => println("  rejected: " + e.getMessage.linesIterator.next()) }

    println("== partition DELETE")
    spark.sql("CREATE TABLE graft.demo.p (pt INT, v STRING) PARTITIONED BY (pt)")
    spark.sql("INSERT INTO graft.demo.p VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("DELETE FROM graft.demo.p WHERE pt = 2")
    spark.sql("SELECT * FROM graft.demo.p ORDER BY pt").show()
    println("== probe: row-level DELETE on non-partition column")
    try spark.sql("DELETE FROM graft.demo.p WHERE v = 'a'")
    catch { case e: Exception => println("  rejected: " + e.getMessage.linesIterator.next()) }

    spark.stop()
  }
}
