package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Live walkthrough of the incremental streaming source: a checkpointed
  * query consumes commits as micro-batches, resumes from its offset,
  * and skips OVERWRITE snapshots.
  *
  * {{{ sbt "runMain graft.tools.StreamingDemo" }}}
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-stream-demo")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sql("CREATE NAMESPACE graft.demo")
    spark.sql("CREATE TABLE graft.demo.clicks (id BIGINT, page STRING)")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (1,'home'), (2,'cart')")

    val sinkDir = java.nio.file.Files.createTempDirectory("graft-stream-sink")
    var lastCount = 0L
    def runOnce(tag: String): Unit = {
      val q = spark.readStream.table("graft.demo.clicks")
        .writeStream.format("parquet")
        .option("path", sinkDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val sunk = spark.read.parquet(sinkDir.toString)
      val newRows = sunk.count() - lastCount
      lastCount = sunk.count()
      println(s"== $tag: +$newRows new row(s); sink now:")
      sunk.orderBy("id").show()
    }

    runOnce("batch1") // expect ids 1,2

    println("== two more commits while the query is stopped")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (3,'search')")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (4,'checkout')")
    runOnce("batch2") // checkpoint resume: only ids 3,4 (incremental)

    println("== probe: INSERT OVERWRITE is skipped by the stream")
    spark.sql("INSERT OVERWRITE graft.demo.clicks VALUES (9,'reset')")
    runOnce("batch3") // expect EMPTY (overwrite snapshot skipped)

    println("== probe: append after overwrite resumes streaming")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (10,'post-reset')")
    runOnce("batch4") // expect id 10 only

    println("== batch view after everything (merged table state)")
    spark.sql("SELECT * FROM graft.demo.clicks ORDER BY id").show()

    spark.stop()
  }
}
